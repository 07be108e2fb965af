package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the word_ngrams codegen kernel (OPTIMIZATION r14) against the
  * higher-order-function spellings it replaced in every posting builder —
  * the kernel must be token-for-token identical or every text oracle
  * would drift. Edge shapes included: empty string, all spaces, repeated
  * interior/leading/trailing spaces, fewer-than-n tokens, multi-byte
  * UTF-8 (0x20 never occurs inside a UTF-8 sequence, so the byte walk
  * must be exact there too), and tabs/newlines (NOT separators — only
  * the literal space splits, the split-on-' ' contract).
  */
class WordNgramsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val cases = Seq(
    "the quick brown fox",
    "",
    "   ",
    "  a  b   c ",
    "one",
    "two words",
    "tab\tand\nnewline stay inside tokens",
    "unicode café naïve 日本語 ok",
    "x " * 2000 + "tail")

  test("word_ngrams(t, 1) equals filter(split(t, ' '), x -> x <> '')") {
    val df = cases.toDF("t")
    val rows = df.selectExpr(
      "word_ngrams(t, 1) AS k",
      "filter(split(t, ' '), x -> x <> '') AS s").collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1))
    }
  }

  test("word_ngrams(t, 2) equals the zip_with bigram spelling") {
    val df = cases.toDF("t")
    val rows = df.selectExpr(
      "word_ngrams(t, 2) AS k",
      """CASE WHEN size(filter(split(t, ' '), x -> x <> '')) < 2 THEN array()
        |ELSE zip_with(
        |  slice(filter(split(t, ' '), x -> x <> ''), 1, size(filter(split(t, ' '), x -> x <> '')) - 1),
        |  slice(filter(split(t, ' '), x -> x <> ''), 2, size(filter(split(t, ' '), x -> x <> '')) - 1),
        |  (a, b) -> concat(a, ' ', b)) END AS s""".stripMargin).collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1))
    }
  }

  test("word_ngrams(t, 3) equals the transform/sequence trigram spelling") {
    val df = cases.toDF("t")
    val rows = df.selectExpr(
      "word_ngrams(t, 3) AS k",
      """CASE WHEN size(filter(split(t, ' '), x -> x <> '')) < 3 THEN array()
        |ELSE transform(
        |  sequence(0, size(filter(split(t, ' '), x -> x <> '')) - 3),
        |  i -> concat(filter(split(t, ' '), x -> x <> '')[i], ' ',
        |              filter(split(t, ' '), x -> x <> '')[i + 1], ' ',
        |              filter(split(t, ' '), x -> x <> '')[i + 2])) END AS s""".stripMargin)
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1))
    }
  }

  test("word_ngrams(t, 5) equals the decontamination transform/concat_ws spelling") {
    val df = cases.toDF("t")
    val rows = df.selectExpr(
      "word_ngrams(t, 5) AS k",
      """CASE WHEN size(filter(split(t, ' '), x -> x <> '')) < 5 THEN array()
        |ELSE transform(
        |  sequence(0, size(filter(split(t, ' '), x -> x <> '')) - 5),
        |  i -> concat_ws(' ',
        |       filter(split(t, ' '), x -> x <> '')[i],
        |       filter(split(t, ' '), x -> x <> '')[i + 1],
        |       filter(split(t, ' '), x -> x <> '')[i + 2],
        |       filter(split(t, ' '), x -> x <> '')[i + 3],
        |       filter(split(t, ' '), x -> x <> '')[i + 4])) END AS s""".stripMargin)
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1))
    }
  }

  test("NULL propagates; n must be a foldable INT literal") {
    val r = spark.sql("SELECT word_ngrams(CAST(NULL AS STRING), 2) AS k").head()
    assert(r.isNullAt(0))
    // the foldable spelling must SUCCEED (outside the intercept — ADVICE
    // r14: a throw here used to satisfy the intercept and hide itself)
    val ok = spark.sql("SELECT word_ngrams('a b', 1 + 0) AS k").head()
    assert(ok.getSeq[String](0) == Seq("a", "b"))
    val e = intercept[Exception] {
      spark.sql("SELECT word_ngrams('a b', CAST(rand() * 2 AS INT))").head()
    }
    assert(e.getMessage.contains("word_ngrams"))
  }

  // --- word_ngram_tfs (OPTIMIZATION r15): per-row counting kernel ---------
  // Replaces `explode(word_ngrams(...)) … GROUP BY doc_id, token` in every
  // posting builder — doc_id is unique per corpus row, so the kernel's
  // in-row counts must equal the aggregate's per-group counts exactly.

  test("word_ngram_tfs equals the explode+GROUP BY aggregate on edge shapes") {
    for (n <- 1 to 3) {
      val df = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "t")
      df.createOrReplaceTempView("wnt_cases")
      val kern = spark.sql(
        s"SELECT doc_id, inline(word_ngram_tfs(t, $n)) FROM wnt_cases")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      val agg = spark.sql(
        s"""SELECT doc_id, token, count(*) AS tf FROM (
           |  SELECT doc_id, explode(word_ngrams(t, $n)) AS token FROM wnt_cases) x
           |GROUP BY doc_id, token""".stripMargin)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(kern == agg, s"n=$n")
    }
  }

  test("word_ngram_tfs equals the aggregate on the gate corpus (all orders)") {
    Engine.registerAll(spark, "/root/testdata/sf0.001")
    for (n <- 1 to 3) {
      val kern = spark.sql(
        s"SELECT doc_id, inline(word_ngram_tfs(lower(text), $n)) FROM documents")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      val agg = spark.sql(
        s"""SELECT doc_id, token, count(*) AS tf FROM (
           |  SELECT doc_id, explode(word_ngrams(lower(text), $n)) AS token
           |  FROM documents) x
           |GROUP BY doc_id, token""".stripMargin)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(kern == agg, s"n=$n")
    }
  }

  test("word_ngram_tfs: NULL propagates, validated builder, deterministic order") {
    val r = spark.sql("SELECT word_ngram_tfs(CAST(NULL AS STRING), 1) AS k").head()
    assert(r.isNullAt(0))
    val e = intercept[Exception] {
      spark.sql("SELECT word_ngram_tfs('a b', CAST(rand() * 2 AS INT))").head()
    }
    assert(e.getMessage.contains("word_ngram_tfs"))
    val e2 = intercept[Exception] {
      spark.sql("SELECT word_ngram_tfs('a b')").head()
    }
    assert(e2.getMessage.contains("word_ngram_tfs"))
    // first-occurrence order — the same input must produce the same array
    val rows = spark.sql(
      "SELECT word_ngram_tfs('b a b c a b', 1) AS k").collect()
    val arr = rows(0).getSeq[org.apache.spark.sql.Row](0)
      .map(x => (x.getString(0), x.getLong(1)))
    assert(arr == Seq(("b", 3L), ("a", 2L), ("c", 1L)))
  }
}
