package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins for the text_stats curation kernel: its four counts must equal
  * the Java-regex SQL spelling it replaced (the spelling whose DuckDB
  * oracle parity is the hash-green history of pipeline_curate) — over
  * the FULL sf0.01 corpus, not samples, plus the edge shapes the corpus
  * may not contain (boundary punctuation, digits/underscores inside
  * word runs, prefix-of-stopword words, non-ASCII, empty).
  */
class TextStatsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  private val regexCols = Seq(
    "CAST(size(regexp_extract_all(text, '\\\\S+', 0)) AS BIGINT) AS r0",
    "CAST(size(regexp_extract_all(lower(text), '\\\\b(the|a|and|of|to|in|is)\\\\b', 0)) AS BIGINT) AS r1",
    "CAST(size(regexp_extract_all(lower(text), '[a-z]+', 0)) AS BIGINT) AS r2",
    "CAST(size(array_distinct(regexp_extract_all(lower(text), '[a-z]+', 0))) AS BIGINT) AS r3")

  private def compareOn(df: org.apache.spark.sql.DataFrame): Unit = {
    val both = df.selectExpr(Seq("text", "text_stats(text) AS ts") ++ regexCols: _*)
      .selectExpr("text", "ts",
        "array(r0, r1, r2, r3) AS rs")
    val diff = both.where("ts[0] <> rs[0] OR ts[1] <> rs[1] OR ts[2] <> rs[2] OR ts[3] <> rs[3]")
      .collect()
    assert(diff.isEmpty, s"kernel/regex divergence on: ${diff.take(3).mkString(" | ")}")
  }

  test("text_stats equals the regex spelling over the full sf0.01 documents corpus") {
    compareOn(Engine.table(spark, sf, "documents"))
  }

  test("text_stats equals the regex spelling on adversarial edge strings") {
    import spark.implicits._
    val edges = Seq(
      "",
      "   \t\n  ",
      "the",
      "a",
      "theory island to-day in_x a_b the.the,the",
      "A AND OF To iS tHe",              // case folding
      "1a and2 _the of9of a1 2of",       // digits/underscore break \\w runs
      "x-y a-b-c the-a-of",              // hyphens are word boundaries
      "naïve café über the a to", // non-ASCII letters + nbsp (nbsp is NOT Java \\s)
      "  leading and trailing  ",
      "!!! ??? ,,, the!is?of.",
      "word word word the the the",
      "the" + 11.toChar + "is of",      // \\x0B (VT) IS Java \\s whitespace
      "ab" * 2000 + " the")              // long single token
    compareOn(edges.toDF("text"))
  }

  test("text_stats interpreted eval matches the DataFrame (codegen) path") {
    import org.apache.spark.unsafe.types.UTF8String
    import spark.implicits._
    val samples = Engine.table(spark, sf, "documents")
      .selectExpr("text").limit(50).as[String].collect()
    val viaDf = samples.toSeq.toDF("text")
      .selectExpr("text_stats(text) AS ts").as[Seq[Long]].collect()
    samples.zip(viaDf).foreach { case (s, df) =>
      assert(functions.TextStats.compute(UTF8String.fromString(s)).toSeq == df)
    }
  }
}
