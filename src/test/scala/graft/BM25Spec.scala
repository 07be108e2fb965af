package graft

import graft.queries.TextAnalysis
import org.scalatest.funsuite.AnyFunSuite

/** Pins for integer-exact BM25 (`ta_bm25`): the score must equal a
  * from-scratch driver replay of the spec'd formula
  *
  *   idf  = bitlen(N) − bitlen(df)
  *   ndl  = (256·dl·N) div A
  *   term = (5632·tf·idf·2^20) div (2560·tf + 768 + 9·ndl)
  *
  * on every (query, candidate) pair — tf saturation, length
  * normalization, stopword suppression (idf = 0 when df is within a
  * power of two of N) all exercised — and the probe join must broadcast
  * the query-token side, never shuffle a corpus-wide vocabulary.
  */
class BM25Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def bitlen(x: Long): Int = 64 - java.lang.Long.numberOfLeadingZeros(x)

  /** The formula, from scratch: independent tokenization, counting, and
    * integer arithmetic (no SQL). */
  private def ref(docs: Seq[(Long, String)], nQ: Int, k: Int): Seq[(Long, Long, Long, Int)] = {
    val dt: Map[Long, Map[String, Long]] = docs.map { case (id, t) =>
      id -> t.toLowerCase.split(" ").filter(_.nonEmpty).toSeq
        .groupBy(identity).map { case (w, o) => w -> o.size.toLong }
    }.toMap.filter(_._2.nonEmpty)
    val dl = dt.map { case (id, m) => id -> m.values.sum }
    val n = dl.size.toLong
    val a = dl.values.sum
    val df: Map[String, Long] =
      dt.values.flatMap(_.keys).toSeq.groupBy(identity).map { case (w, o) => w -> o.size.toLong }
    // the operator's declared contract: zero-idf (stopword) terms are
    // dropped before the fan-out — a candidate reachable only through
    // them does not rank (their term contribution is exactly 0 anyway)
    val out = for {
      q <- dt.keys.toSeq if q < nQ
      c <- dt.keys.toSeq if c != q
      shared = dt(q).keySet.intersect(dt(c).keySet)
        .filter(w => bitlen(n) > bitlen(df(w))) if shared.nonEmpty
    } yield {
      val ndl = (256L * dl(c) * n) / a
      val score = shared.toSeq.map { w =>
        val tf = dt(c)(w)
        val idf = (bitlen(n) - bitlen(df(w))).toLong
        (5632L * tf * idf * 1048576L) / (2560L * tf + 768L + 9L * ndl)
      }.sum
      (q, c, score)
    }
    out.groupBy(_._1).toSeq.flatMap { case (q, cands) =>
      cands.sortBy { case (_, c, s) => (-s, c) }.take(k).zipWithIndex
        .map { case ((_, c, s), i) => (q, c, s, i + 1) }
    }.sortBy(r => (r._1, r._4))
  }

  private def runOn(docs: Seq[(Long, String)]): Seq[(Long, Long, Long, Int)] = {
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25_").toString
    import spark.implicits._
    docs.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    TextAnalysis.bm25(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSeq
  }

  test("score equals the from-scratch integer replay, rank and tie-break included") {
    // 2 query docs, a stopword 'the' in every doc (idf 0 — must not
    // score), rare terms with varying tf and doc lengths, one tie.
    val docs: Seq[(Long, String)] = Seq(
      0L -> "the quick brown fox jumps",
      1L -> "the slow green turtle sleeps",
      10L -> "the quick quick quick fox den is a long document with many extra words here",
      11L -> "the quick fox",
      12L -> "the brown bear and the brown dog",
      13L -> "the slow turtle",
      14L -> "quick brown fox jumps exactly",
      15L -> "the the the the",
      16L -> "green sleeps slow turtle the",
      17L -> "unrelated words entirely different")
    assert(runOn(docs) == ref(docs, nQ = 8, k = 10))
  }

  test("per-term saturation: repeating a term lifts the score sub-linearly") {
    val docs: Seq[(Long, String)] = Seq(
      0L -> "needle haystack",
      // 24 one-token filler docs push bitlen(N) past bitlen(df)
      10L -> "needle",
      11L -> "needle needle",
      12L -> "needle needle needle needle needle needle needle needle") ++
      (20L until 44L).map(i => i -> "filler")
    val got = runOn(docs).filter(_._1 == 0L)
    val s = got.map(r => r._2 -> r._3).toMap
    assert(s(10L) > 0, "single occurrence must score")
    assert(s(11L) > s(10L), "2×tf beats 1×tf")
    assert(s(12L) > s(11L), "8×tf beats 2×tf")
    assert(s(12L) < 4 * s(11L), "saturation: 4× the tf must not 4× the score")
  }

  test("probe join broadcasts the query tokens; no corpus-wide vocab shuffle") {
    val plan = TextAnalysis.bm25(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "query-token probe must broadcast")
  }

  test("persisted-index probe equals the in-flight ranking; scan reads the stored postings") {
    val sf = "/root/testdata/sf0.001"
    val direct = TextAnalysis.bm25(spark, sf).collect().map(_.toString).toSeq
    val viaIndex = TextAnalysis.bm25Indexed(spark, sf)
    val plan = viaIndex.queryExecution.executedPlan.toString
    assert(plan.contains("postings"), "probe must scan the stored posting file")
    assert(direct.nonEmpty && viaIndex.collect().map(_.toString).toSeq == direct,
      "stored-index probe diverged from the in-flight ranking")
  }

  test("streaming probe equals the batch census ranking, query for query") {
    val sf = "/root/testdata/sf0.001"
    val expected = TextAnalysis.bm25(spark, sf).collect().map(_.toString).toSet
    val srcDir = java.nio.file.Files.createTempDirectory("graft_bm25_src_").toString
    Engine.table(spark, sf, "documents")
      .filter("doc_id < 8").selectExpr("doc_id AS query_id", "text")
      .write.mode("overwrite").parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema
    val stream = spark.readStream.schema(schema).parquet(srcDir)
    val got = scala.collection.mutable.ArrayBuffer.empty[String]
    val q = graft.streaming.Streams.bm25Probe(stream, sf) { ranked =>
      got ++= ranked.collect().map(_.toString)
    }
    try {
      q.processAllAvailable()
      assert(got.nonEmpty && got.toSet == expected,
        s"streaming bm25 diverged: got ${got.size} rows, expected ${expected.size}")
    } finally q.stop()
  }
}
