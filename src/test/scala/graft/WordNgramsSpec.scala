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

  test("NULL propagates; n must be a foldable INT literal") {
    val r = spark.sql("SELECT word_ngrams(CAST(NULL AS STRING), 2) AS k").head()
    assert(r.isNullAt(0))
    val e = intercept[Exception] {
      spark.sql("SELECT word_ngrams('a b', 1 + 0)").head() // foldable: fine
      spark.sql("SELECT word_ngrams('a b', CAST(rand() * 2 AS INT))").head()
    }
    assert(e.getMessage.contains("word_ngrams"))
  }
}
