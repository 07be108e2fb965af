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

  /** The unigram formula, from scratch: independent tokenization feeding
    * [[ref2]]'s integer arithmetic (no SQL). The zero-idf (stopword)
    * suppression contract — a candidate reachable only through terms
    * whose df is within a power of two of N does not rank — lives in
    * ref2's shared-term filter. */
  private def ref(docs: Seq[(Long, String)], nQ: Int, k: Int): Seq[(Long, Long, Long, Int)] =
    ref2(docs.map { case (id, t) =>
      id -> t.toLowerCase.split(" ").filter(_.nonEmpty).toSeq
    }, nQ, k)

  private def runOn(docs: Seq[(Long, String)]): Seq[(Long, Long, Long, Int)] =
    TextAnalysis.bm25(spark, writeDocs(docs)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSeq

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

  /** Independent bigram replay: tokenize to adjacent word pairs, then the
    * SAME integer formula — pins `ta_bm25_bigram` (the non-vacuous census
    * spelling, VERDICT r12 #1) against from-scratch arithmetic. */
  private def refBigram(docs: Seq[(Long, String)], nQ: Int, k: Int): Seq[(Long, Long, Long, Int)] =
    ref2(docs.map { case (id, t) =>
      val w = t.toLowerCase.split(" ").filter(_.nonEmpty).toSeq
      id -> w.zip(w.drop(1)).map { case (a, b) => s"$a $b" }
    }, nQ, k)

  /** [[ref]]'s scoring over pre-tokenized docs (shared by both units). */
  private def ref2(tokenized: Seq[(Long, Seq[String])], nQ: Int, k: Int): Seq[(Long, Long, Long, Int)] = {
    val dt: Map[Long, Map[String, Long]] = tokenized.map { case (id, ts) =>
      id -> ts.groupBy(identity).map { case (w, o) => w -> o.size.toLong }
    }.toMap.filter(_._2.nonEmpty)
    val dl = dt.map { case (id, m) => id -> m.values.sum }
    val n = dl.size.toLong
    val a = dl.values.sum
    val df: Map[String, Long] =
      dt.values.flatMap(_.keys).toSeq.groupBy(identity).map { case (w, o) => w -> o.size.toLong }
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

  private def writeDocs(docs: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25_").toString
    import spark.implicits._
    docs.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("bigram spelling equals the from-scratch bigram replay (multi-term sums, non-vacuous)") {
    // shared phrases so bigram overlaps exist; distinct doc lengths
    val docs: Seq[(Long, String)] = Seq(
      0L -> "the quick brown fox jumps high",
      1L -> "a slow green turtle sleeps",
      10L -> "the quick brown fox runs the quick brown fox returns",
      11L -> "quick brown shoes",
      12L -> "a slow green turtle crawls onward every day",
      13L -> "the quick start guide",
      14L -> "green turtle sleeps a slow green turtle sleeps",
      15L -> "completely unrelated content here",
      16L -> "fox jumps high above",
      17L -> "the quick brown bear")
    val got = TextAnalysis.bm25Bigram(spark, writeDocs(docs)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSeq
    val want = refBigram(docs, nQ = 8, k = 10)
    assert(want.nonEmpty && got == want)
  }

  test("persisted-index probe equals the in-flight bigram ranking; scan reads the stored postings") {
    val sf = "/root/testdata/sf0.001"
    val direct = TextAnalysis.bm25Bigram(spark, sf).collect().map(_.toString).toSeq
    val viaIndex = TextAnalysis.bm25Indexed(spark, sf)
    val plan = viaIndex.queryExecution.executedPlan.toString
    assert(plan.contains("postings"), "probe must scan the stored posting file")
    assert(direct.nonEmpty && viaIndex.collect().map(_.toString).toSeq == direct,
      "stored-index probe diverged from the in-flight ranking")
  }

  test("stored doclen (r15 per-row projection) equals the posting roll-up it replaced") {
    // writeBm25Slice now writes dl = size(word_ngrams(lower(text), n))
    // per row instead of re-aggregating the posting relation; the stored
    // rows must equal `SELECT doc_id, sum(tf) … GROUP BY doc_id` exactly
    // (same doc set — zero-n-gram docs excluded — same BIGINT values)
    val sf = "/root/testdata/sf0.001"
    val idx = Engine.scratchDir("graft_bm25_dlspec_") + "/index"
    TextAnalysis.writeBm25Index(spark, sf, idx)
    val stored = spark.read.parquet(s"$idx/doclen")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    Engine.registerAll(spark, sf)
    val agg = spark.sql(
      """SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM (
        |  SELECT doc_id, token, count(*) AS tf FROM (
        |    SELECT doc_id, explode(word_ngrams(lower(text), 2)) AS token
        |    FROM documents) t
        |  GROUP BY doc_id, token) p
        |GROUP BY doc_id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(stored.nonEmpty && stored == agg)
  }

  test("serving default keeps a colliding doc_id in the ranking; census flag drops it") {
    // query_id 10 collides with corpus doc 10 — the ADVICE r12 case:
    // an arbitrary batch's id namespace must not silently exclude doc 10.
    val docs: Seq[(Long, String)] = Seq(
      10L -> "needle haystack needle",
      11L -> "needle haystack",
      12L -> "haystack only here") ++ (20L until 40L).map(i => i -> "filler words")
    val sf = writeDocs(docs)
    import spark.implicits._
    val batch = Seq((10L, "needle haystack")).toDF("query_id", "text")
    val serving = TextAnalysis.searchBm25(batch, sf).collect()
    assert(serving.exists(r => r.getLong(1) == 10L),
      "excludeSelf=false (serving) must rank corpus doc 10 despite the id collision")
    val census = TextAnalysis.searchBm25(batch, sf, excludeSelf = true).collect()
    assert(!census.exists(r => r.getLong(1) == 10L),
      "excludeSelf=true must drop the query's own row")
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
    // the census queries ARE corpus docs, so the stream-equals-batch pin
    // runs the probe with the census's self-exclusion flag
    val q = graft.streaming.Streams.bm25Probe(stream, sf, excludeSelf = true) { ranked =>
      got ++= ranked.collect().map(_.toString)
    }
    try {
      q.processAllAvailable()
      assert(got.nonEmpty && got.toSet == expected,
        s"streaming bm25 diverged: got ${got.size} rows, expected ${expected.size}")
    } finally q.stop()
  }
}
