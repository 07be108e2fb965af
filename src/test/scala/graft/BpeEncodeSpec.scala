package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins for BPE encoding (`ta_bpe_encode`) — the apply half of the
  * tokenizer loop. The encoder composes the trained merge list over the
  * vocabulary with the same bounded two-pass replace the trainer used,
  * so its output must be byte-identical to replaying the merges by hand,
  * must reassemble to the original word, and must never expand a word
  * past its character count (the compression invariant a tokenizer
  * report is built on).
  */
class BpeEncodeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  /** The trainer/encoder merge spelling, replayed on the driver: Java's
    * String.replace is the same literal, left-to-right, non-overlapping
    * scan as SQL replace in both engines. */
  private def applyMerges(w: String, merges: Seq[String]): String = {
    var sym = " " + w.toCharArray.mkString(" ") + " "
    merges.foreach { pair =>
      val m = pair.replace(" ", "")
      sym = sym.replace(s" $pair ", s" $m ").replace(s" $pair ", s" $m ")
    }
    sym.trim
  }

  test("encode equals a by-hand replay of the trained merge list") {
    val merges = queries.TextAnalysis.bpeMerges(spark, sf)
      .collect().map(_.getString(1)).toSeq
    val enc = queries.TextAnalysis.bpeEncode(spark, sf).collect()
    assert(enc.nonEmpty)
    enc.foreach { r =>
      val (w, toks, nTok) = (r.getString(0), r.getString(2), r.getInt(3))
      assert(toks === applyMerges(w, merges),
        s"encode($w) diverged from the merge replay")
      assert(nTok === toks.split(' ').length)
      // losslessness: symbols reassemble to the word
      assert(toks.replace(" ", "") === w)
      // compression invariant: merging never adds tokens
      assert(nTok <= w.length)
    }
  }

  test("top words are most-frequent-first and at least one word compressed") {
    val enc = queries.TextAnalysis.bpeEncode(spark, sf).collect()
    val wfs = enc.map(_.getLong(1)).toSeq
    assert(wfs === wfs.sorted.reverse, "report must be ordered by wf desc")
    // with 8 merge rounds over real text, the most frequent words merge
    assert(enc.exists(r => r.getInt(3) < r.getString(0).length),
      "no word compressed — the merges were not applied")
  }

  test("planted corpus: the dominant pair chain tokenizes as trained") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_bpeenc_").toString
    // 'the' dominates: merges should build it within 2 rounds, and encode
    // must then tokenize 'the' as the single merged symbol.
    val docs = (0L until 50L).map(i => (i, "the cat the dog the", "en", "s", 10L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val enc = queries.TextAnalysis.bpeEncode(spark, dir).collect()
      .map(r => r.getString(0) -> r.getString(2)).toMap
    assert(enc("the") === "the", s"'the' should fully merge: ${enc("the")}")
  }
}
