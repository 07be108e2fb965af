package graft

import graft.queries.{Classify, Ivm}
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the trained-classifier axis (`ta_nb_train`,
  * `pipeline_classify`, `pipeline_dsir`, `ivm_nb`).
  *
  * Three claims, each with its own failure mode:
  *   1. EXACTNESS — flog2 and the NB llr equal a from-scratch Scala
  *      replay of the spec'd integer formula on planted data;
  *   2. LEARNING — the classifier GENERALIZES: held-out accuracy on the
  *      driver corpus beats the majority base rate by a wide pinned
  *      margin (the non-vacuous-evidence bar VERDICT r11/r12 set: a
  *      hash-green key must also demonstrate its semantic point), and
  *      DSIR's selected set is measurably enriched in the target trait;
  *   3. MAINTENANCE — `ivm_nb`'s retract→refresh→score equals one-shot
  *      training on the edited slice, Spark-side (the census oracle
  *      re-proves it against DuckDB).
  */
class ClassifySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  // --- the from-scratch integer replay ------------------------------------
  private def bitlen(x: Long): Int = 64 - java.lang.Long.numberOfLeadingZeros(x)
  private def flog2(x: Long): Long = {
    require(x >= 1, s"flog2 domain: $x")
    val b = bitlen(x); val p = 1L << (b - 1)
    (b - 1).toLong * 65536L + (x - p) * 65536L / p
  }

  test("flog2: SQL spelling equals the Scala replay; monotone; finer than bitlen") {
    val xs = Seq(1L, 2L, 3L, 4L, 5L, 7L, 8L, 402L, 500L, 65535L, 65536L,
      1000000007L, Long.MaxValue / 2)
    val sql = xs.map(x => {
      val e = Classify.flog2Spark(s"CAST($x AS BIGINT)")
      s"SELECT $e AS v"
    }).mkString(" UNION ALL ")
    val got = spark.sql(sql).collect().map(_.getLong(0)).toSeq
    assert(got == xs.map(flog2))
    assert(xs.map(flog2) == xs.map(flog2).sorted)
    // the whole point: counts inside one power of two separate
    assert(flog2(500L) - flog2(402L) == 25088L)
  }

  // NB replay: multinomial with Laplace smoothing, flog2 logs, prior.
  private def tokens(t: String): Seq[String] =
    t.toLowerCase.split(" ").filter(_.nonEmpty).toSeq
  private def label(toks: Seq[String]): Int =
    if (toks.count(_ == "fast") > toks.count(_ == "slow")) 1 else 0

  private def refNb(docs: Seq[(Long, String)]): Seq[(Long, Long, Int)] = {
    val train = docs.filter(_._1 % 2 == 0).map { case (id, t) => id -> tokens(t) }
    val test = docs.filter(_._1 % 2 != 0).map { case (id, t) => id -> tokens(t) }
    val (pos, neg) = train.partition { case (_, tk) => label(tk) == 1 }
    def counts(ds: Seq[(Long, Seq[String])]): Map[String, Long] =
      ds.flatMap(_._2).groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val (c1, c0) = (counts(pos), counts(neg))
    val vocab = (c1.keySet ++ c0.keySet)
    val (t1, t0, v) = (c1.values.sum, c0.values.sum, vocab.size.toLong)
    val prior = flog2(pos.size + 1L) - flog2(neg.size + 1L)
    test.map { case (id, tk) =>
      val lw = tk.groupBy(identity).map { case (w, occ) =>
        occ.size.toLong * ((flog2(c1.getOrElse(w, 0L) + 1) - flog2(t1 + v)) -
          (flog2(c0.getOrElse(w, 0L) + 1) - flog2(t0 + v)))
      }.sum
      val llr = lw + prior
      (id, llr, if (llr >= 0) 1 else 0)
    }.sortBy(_._1)
  }

  private def writeDocs(docs: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_nb_").toString
    import spark.implicits._
    docs.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("planted data: llr equals the from-scratch NB replay, OOV smoothing included") {
    val docs: Seq[(Long, String)] = Seq(
      0L -> "fast fast query scan slow",          // train pos
      2L -> "fast join merge",                    // train pos
      4L -> "slow slow table scan",               // train neg
      6L -> "slow batch window fast",             // train neg (tie -> 0? 1>1 false)
      8L -> "query window group",                 // train neg (0>0 false)
      1L -> "fast fast fast scan",                // held out
      3L -> "slow slow merge",                    // held out
      5L -> "query join group window",            // held out: all-common tokens
      7L -> "oov tokens entirely unseen fast")    // held out: OOV smoothing arm
    val got = Classify.classify(spark, writeDocs(docs)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    val want = refNb(docs)
    assert(want.exists(_._3 == 1) && want.exists(_._3 == 0)) // non-degenerate
    assert(got == want)
  }

  test("the classifier LEARNS: held-out accuracy beats the base rate at the gate tier") {
    Engine.table(spark, sf, "documents").createOrReplaceTempView("documents")
    val truth = spark.sql(
      """SELECT doc_id,
        |  CASE WHEN size(filter(split(lower(text), ' '), x -> x = 'fast'))
        |        > size(filter(split(lower(text), ' '), x -> x = 'slow'))
        |       THEN 1 ELSE 0 END AS pos
        |FROM documents WHERE doc_id % 2 <> 0""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val pred = Classify.classify(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(pred.keySet == truth.keySet)
    val acc = pred.count { case (id, k) => truth(id) == k }.toDouble / pred.size
    val base = math.max(truth.values.sum, truth.size - truth.values.sum).toDouble / truth.size
    // measured 0.884 vs base 0.648 at sf0.001 (0.904/0.676 at sf0.01)
    assert(acc >= 0.80, s"held-out accuracy $acc")
    assert(acc >= base + 0.10, s"accuracy $acc does not beat base rate $base")
  }

  test("DSIR enriches the selected set toward the target density") {
    Engine.table(spark, sf, "documents").createOrReplaceTempView("documents")
    val stats = spark.sql(
      """SELECT doc_id,
        |  size(filter(split(lower(text), ' '), x -> x = 'vector')) AS v,
        |  size(filter(split(lower(text), ' '), x -> x <> '')) AS n
        |FROM documents""".stripMargin)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    def dense(id: Long): Boolean = { val (v, n) = stats(id); v * 16 >= n }
    val sel = Classify.dsir(spark, sf).collect().map(_.getLong(0)).toSeq
    assert(sel.size == 128)
    val selRate = sel.count(dense).toDouble / sel.size
    val baseRate = stats.keys.count(dense).toDouble / stats.size
    // measured 0.5625 selected vs 0.156 corpus at sf0.001
    assert(selRate >= 2.5 * baseRate,
      s"selected dense rate $selRate vs corpus $baseRate — no enrichment")
  }

  test("ivm_nb: incremental retract+refresh equals one-shot training on the edited slice") {
    val incr = Ivm.nbRetract.run(spark, sf).collect().map(_.toString).toSeq
    val oneShot = Classify
      .classifyOneShot(spark, sf, " AND (doc_id % 13 <> 0 OR doc_id % 4 = 0)")
      .collect().map(_.toString).toSeq
    assert(incr.nonEmpty && incr == oneShot)
    // and the edit is not a no-op: the unedited model scores differently
    val unedited = Classify.classifyOneShot(spark, sf).collect().map(_.toString).toSeq
    assert(incr != unedited)
  }

  test("serving: scoreBatch from the registered model equals the census scores") {
    Classify.registerModel(spark, sf)
    val batchIds = Seq(1L, 3L, 7L, 9L, 11L)
    val batch = Engine.table(spark, sf, "documents")
      .filter(org.apache.spark.sql.functions.col("doc_id").isin(batchIds: _*))
      .select("doc_id", "text")
    val served = Classify.scoreBatch(batch).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    val census = Classify.classify(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .filter(r => batchIds.contains(r._1)).toSeq
    assert(served == census)
  }

  test("ta_nb_pr: the binned operating curve equals a from-scratch fold of the scored corpus") {
    Engine.table(spark, sf, "documents").createOrReplaceTempView("documents")
    val truth = spark.sql(
      """SELECT doc_id,
        |  CASE WHEN size(filter(split(lower(text), ' '), x -> x = 'fast'))
        |        > size(filter(split(lower(text), ' '), x -> x = 'slow'))
        |       THEN 1L ELSE 0L END AS pos
        |FROM documents WHERE doc_id % 2 <> 0""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val scored = Classify.classify(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // fold: bin to whole bits, cumulative from the top bin down
    val bins = scored.groupBy { case (_, llr) => math.floor(llr / 65536.0).toLong }
      .map { case (b, ds) => (b, ds.size.toLong, ds.map(d => truth(d._1)).sum) }
      .toSeq.sortBy(-_._1)
    val pAll = bins.map(_._3).sum
    var (cumN, tp) = (0L, 0L)
    val want = bins.map { case (b, n, pos) =>
      cumN += n; tp += pos
      (b, n, pos, tp, cumN - tp, pAll - tp, tp.toDouble / cumN, tp.toDouble / pAll)
    }
    val got = Classify.nbPr(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6), r.getDouble(7))).toSeq
    assert(got.size >= 3, "degenerate curve: fewer than 3 bins")
    assert(got == want)
    // the curve is a real trade-off: recall rises to 1, precision varies
    assert(got.last._8 == 1.0 && got.map(_._7).distinct.size > 1)
  }

  test("streaming probe equals batch serving, doc for doc") {
    val expected = {
      Classify.registerModel(spark, sf)
      val batch = Engine.table(spark, sf, "documents")
        .filter("doc_id % 2 <> 0 AND doc_id < 40").select("doc_id", "text")
      Classify.scoreBatch(batch).collect().map(_.toString).toSet
    }
    val srcDir = java.nio.file.Files.createTempDirectory("graft_nb_src_").toString
    Engine.table(spark, sf, "documents")
      .filter("doc_id % 2 <> 0 AND doc_id < 40").select("doc_id", "text")
      .write.mode("overwrite").parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema
    val stream = spark.readStream.schema(schema).parquet(srcDir)
    val got = scala.collection.mutable.ArrayBuffer.empty[String]
    val q = graft.streaming.Streams.classifyProbe(stream, sf) { scored =>
      got ++= scored.collect().map(_.toString)
    }
    try {
      q.processAllAvailable()
      assert(got.nonEmpty && got.toSet == expected,
        s"streaming classify diverged: got ${got.size} rows, expected ${expected.size}")
    } finally q.stop()
  }

  test("corpus-drift guards: both classes populated in the train slice; the curve has real bins") {
    // The ta_bm25 lesson applied to this axis (VERDICT r13 #6): every
    // classifier key rides the two-token 'fast'/'slow' rule — a corpus
    // regeneration that rebalanced those tokens would silently vacuate
    // the axis (degenerate one-class training, a flat operating curve)
    // while every oracle stayed green. Fail LOUDLY here instead, at the
    // test corpus and at the driver's sf0.01 gate corpus.
    for (dir <- Seq(sf, "/root/testdata/sf0.01")
         if new java.io.File(s"$dir/documents.parquet").exists) {
      Engine.table(spark, dir, "documents").createOrReplaceTempView("documents")
      val r = spark.sql(
        """SELECT sum(pos) AS p, count(*) AS n FROM (
          |  SELECT CASE WHEN size(filter(split(lower(text), ' '), x -> x = 'fast'))
          |            > size(filter(split(lower(text), ' '), x -> x = 'slow'))
          |         THEN 1 ELSE 0 END AS pos
          |  FROM documents WHERE doc_id % 2 = 0) t""".stripMargin).collect()(0)
      val (p, n) = (r.getLong(0), r.getLong(1))
      assert(p * 10 >= n && (n - p) * 10 >= n,
        s"train slice degenerate at $dir: $p positive of $n — corpus drift " +
          "has vacuated the weak-supervision rule; re-pick the label tokens")
    }
    val bins = Classify.nbPr(spark, sf).collect().map(_.getLong(0)).distinct
    assert(bins.length >= 3,
      s"operating curve collapsed to ${bins.length} bit bins — scores no longer separate")
  }

  test("dsir r15 window-fused spelling equals the r14 join spelling row for row") {
    // the OPTIMIZATION r15 rewrite (is_tgt window + fused per-bucket
    // aggregate + window totals) against the r14 template it replaced,
    // inlined verbatim here with the same hash/flog2 spellings — the two
    // must agree on every (doc_id, nw, rnk), not just the selected set
    Engine.table(spark, sf, "documents").createOrReplaceTempView("documents")
    def h(x: String) = s"CAST(conv(substr(md5($x), 1, 15), 16, 10) AS BIGINT)"
    def f(x: String) =
      s"((length(bin($x)) - 1) * 65536 + (($x - shiftleft(CAST(1 AS BIGINT), length(bin($x)) - 1)) * 65536) div shiftleft(CAST(1 AS BIGINT), length(bin($x)) - 1))"
    val old = spark.sql(
      s"""WITH post AS (
         |  SELECT doc_id, token, count(*) AS tf FROM (
         |    SELECT doc_id, explode(word_ngrams(lower(text), 1)) AS token
         |    FROM documents) t
         |  GROUP BY doc_id, token),
         |bt AS (
         |  SELECT doc_id, ${h("token")} % 1024 AS b, tf FROM post),
         |tgtd AS (
         |  SELECT doc_id FROM (
         |    SELECT doc_id, sum(CASE WHEN token = 'vector' THEN tf ELSE 0 END) AS v,
         |           sum(tf) AS n
         |    FROM post GROUP BY doc_id) g
         |  WHERE v * 16 >= n),
         |tgt AS (
         |  SELECT bt.b, sum(bt.tf) AS ct FROM bt
         |  JOIN tgtd ON bt.doc_id = tgtd.doc_id
         |  GROUP BY bt.b),
         |raw AS (SELECT b, sum(tf) AS cr FROM bt GROUP BY b),
         |tots AS (
         |  SELECT (SELECT sum(ct) FROM tgt) AS tt, (SELECT sum(cr) FROM raw) AS tr),
         |wb AS (
         |  SELECT r.b,
         |    (${f("coalesce(g.ct, 0) + 1")} - ${f("t.tt + 1024")})
         |      - (${f("r.cr + 1")} - ${f("t.tr + 1024")}) + ${1 << 24} AS w
         |  FROM raw r LEFT JOIN tgt g ON r.b = g.b CROSS JOIN tots t),
         |nwr AS (
         |  SELECT bt.doc_id,
         |    CAST((sum(bt.tf * wb.w) * 65536) div sum(bt.tf) AS BIGINT) AS nw
         |  FROM bt JOIN wb ON bt.b = wb.b
         |  GROUP BY bt.doc_id)
         |SELECT doc_id, nw,
         |  CAST(row_number() OVER (ORDER BY nw DESC, doc_id) AS INT) AS rnk
         |FROM (SELECT doc_id, nw FROM nwr ORDER BY nw DESC, doc_id LIMIT 128) s
         |ORDER BY rnk""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    val now = Classify.dsir(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(now == old)
  }

  test("plan contracts: the model broadcasts into the scoring join; DSIR selects via top-k, not a global sort") {
    val cPlan = Classify.classify(spark, sf).queryExecution.executedPlan.toString
    assert(cPlan.contains("BroadcastHashJoin"),
      "vocabulary-sized model should broadcast into the posting scan")
    val dPlan = Classify.dsir(spark, sf).queryExecution.executedPlan.toString
    assert(dPlan.contains("TakeOrderedAndProject"),
      "budget-k selection should be TakeOrderedAndProject")
  }
}
