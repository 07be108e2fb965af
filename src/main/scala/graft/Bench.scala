package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline TPC-H set (BASELINE.md) plus the
  * LLM-pipeline set on SPARK_GRAFT_SF_DIR and prints one JSON line.
  * Results are fully materialized via the noop sink so every operator in
  * the plan runs (a bare count() would let Spark skip projection work).
  *
  * Tier discipline (VERDICT r6): every tier section — 32-core and 8-core
  * alike — runs in a FRESH SparkSession. Round 6 measured the 32-core
  * sf10 pipeline at the END of a session that had executed the whole
  * sf0.1+sf1+sf10 history (accumulated cache epochs, catalog state,
  * shuffle dirs) and recorded minhash 2.5× SLOWER than its own 8-core
  * fresh-session twin — session history, not plan cost. A fresh session
  * per (tier × core-count) cell makes every number the same kind of
  * measurement. The OS page cache intentionally persists across sections
  * (that's the warm-read path a long-lived cluster sees); each fresh
  * session re-warms codegen/file listings on sf0.001 before timing.
  *
  * When the generated sf1/sf10 dirs exist (graft.GenData — 10×/100× the
  * driver's sf0.1, join-preserving key offsets), the same sets run there
  * into "sf1"/"sf10" JSON sections: round 5 proved sf0.1 deltas under
  * ~30% are scheduler noise, so the big tiers are where plan regressions
  * are actually measurable. All values are rounded to milliseconds so the
  * whole line stays inside the driver's tail-capture window (BENCH_r06's
  * full-precision doubles overflowed it → "parsed": null).
  */
object Bench {
  private val warmDir = "/root/testdata/sf0.001"

  private def timeOnce(s: SparkSession, dir: String)(q: QueryDef): Double = {
    val t0 = System.nanoTime()
    try q.run(s, dir).write.format("noop").mode("overwrite").save()
    catch { case e: Throwable => System.err.println(s"[bench] ${q.name} failed: $e") }
    (System.nanoTime() - t0) / 1e9
  }

  // best-of-n: later runs reuse warmed file listings/codegen, and the min
  // damps scheduler noise on a shared machine
  private def bestOf(n: Int, s: SparkSession, dir: String)(q: QueryDef): Double =
    Seq.fill(n)(timeOnce(s, dir)(q)).min

  // Probe-only IVF timing: ann_ivf_indexed builds its index inside the
  // query (write-time + probe-time in one number). A serving path pays
  // the build once and probes many times, so the probe against a
  // pre-built index — the partition-pruned scan AnnIndexSpec pins — is
  // measured separately (best-of-2 over one build).
  private def ivfProbeTime(s: SparkSession, dir: String): Double = {
    val idx = java.nio.file.Files
      .createTempDirectory("graft_bench_ivf_").resolve("index").toString
    queries.Similarity.buildIvfIndex(s, dir, idx)
    def once(): Double = {
      val t0 = System.nanoTime()
      queries.Similarity.probeIvfIndex(s, dir, idx)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    math.min(once(), once())
  }

  /** One (tier × core-count) measurement cell in its own session: warm
    * codegen on sf0.001, time each query, stop the session. */
  private def cell(cores: Int, dir: String, sets: Seq[(Seq[QueryDef], Int)],
      withProbe: Boolean): Seq[Seq[(String, Double)]] = {
    val s = Engine.build(master = s"local[$cores]", shufflePartitions = cores)
    try {
      sets.flatMap(_._1).distinct.foreach { q =>
        try q.run(s, warmDir).write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () }
      }
      val timed = sets.map { case (set, n) =>
        set.map(q => q.name -> bestOf(n, s, dir)(q))
      }
      if (withProbe && timed.nonEmpty)
        timed.init :+ (timed.last :+ ("ann_ivf_probe" -> ivfProbeTime(s, dir)))
      else timed
    } finally s.stop()
  }

  private def r3(x: Double): Double = math.rint(x * 1000) / 1000

  private def toJson(kvs: Seq[(String, Double)]): String =
    kvs.map { case (k, v) => "\"" + k + "\":" + r3(v) }.mkString("{", ",", "}")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val sf1Dir = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "/root/repo/benchdata/sf1")
    val sf10Dir = sys.env.getOrElse("SPARK_GRAFT_SF10_DIR", "/root/repo/benchdata/sf10")
    def has(dir: String, t: String) = new java.io.File(s"$dir/$t.parquet").exists
    val haveSf1 = has(sf1Dir, "lineitem")
    val haveSf10 = has(sf10Dir, "lineitem")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val fewCpus = math.max(4, cpus / 4)
    val tpch = queries.Tpch.benchmark

    // LLM-pipeline throughput evidence at sf0.1 (best-of-2, same
    // discipline as TPC-H, so round-over-round deltas are comparable —
    // r6's single-pass numbers moved ±160% on unchanged code).
    val pipelineSet = Seq(
      queries.Dedup.minhash, queries.Dedup.incremental,
      queries.Dedup.containment, queries.Dedup.clusters,
      queries.Similarity.bruteForce, queries.Similarity.ivf,
      queries.Similarity.ivfIndexed,
      queries.Similarity.quantized, queries.Similarity.semantic,
      queries.TextAnalysis.tfidf, queries.TextAnalysis.repetition,
      queries.TextAnalysis.pii, queries.TextAnalysis.boilerplate,
      queries.Curate.curate, queries.Curate.sample,
      queries.Curate.decontam, queries.Curate.mix, queries.Curate.pack,
      queries.Curate.chunk, queries.Curate.rag,
      queries.TextAnalysis.heavyHitters, queries.Events.gapfill)
    // sf1: the heavy pipeline shapes (shuffle-heavy banding, explode+agg,
    // merge-walk verification, window/generate).
    val sf1PipelineSet = Seq(
      queries.Dedup.minhash, queries.Dedup.incremental,
      queries.Dedup.containment,
      queries.Dedup.clusters, queries.TextAnalysis.tfidf,
      queries.Events.gapfill)
    // sf10 docs is where banding/explode become compute-bound (at sf1 the
    // doc pipelines are overhead-dominated); events/embeddings join the
    // tier when GenData has produced them (window + ANN shapes).
    val sf10PipelineSet =
      (if (has(sf10Dir, "documents"))
         Seq(queries.Dedup.minhash, queries.TextAnalysis.tfidf) else Nil) ++
      (if (has(sf10Dir, "events")) Seq(queries.Events.gapfill) else Nil)
    val sf10Probe = has(sf10Dir, "embeddings")

    // Core-count scaling evidence: the 100×-scale claims rest on plan
    // shape; rerunning on a quarter of the cores (fresh session, shuffle
    // partitions matched) catches any parallelism-hostile plan — a
    // healthy plan degrades roughly with core count, a driver-bound or
    // skewed one doesn't.
    val scaledSet = tpch ++
      Seq(queries.Dedup.minhash, queries.TextAnalysis.tfidf, queries.Events.gapfill)
    val bigScaledTpch = tpch.filter(q => q.name == "q1_agg" || q.name == "q5_join")
    val sf1ScaledSet = bigScaledTpch ++
      Seq(queries.Dedup.minhash, queries.TextAnalysis.tfidf)
    val sf10ScaledSet = bigScaledTpch ++ sf10PipelineSet

    // sf0.1 tier
    val Seq(results, pipeline) =
      cell(cpus, sfDir, Seq(tpch -> 3, pipelineSet -> 2), withProbe = true)
    val Seq(scaled) = cell(fewCpus, sfDir, Seq(scaledSet -> 2), withProbe = false)

    // sf1 tier
    val (sf1Results, sf1Pipeline, sf1Scaled) =
      if (haveSf1) {
        val Seq(a, b) =
          cell(cpus, sf1Dir, Seq(tpch -> 2, sf1PipelineSet -> 2), withProbe = true)
        val Seq(c) = cell(fewCpus, sf1Dir, Seq(sf1ScaledSet -> 2), withProbe = false)
        (a, b, c)
      } else (Seq.empty, Seq.empty, Seq.empty)

    // sf10 tier: best-of-3 TPC-H — the 1.5 GB tier is page-cache
    // sensitive (a cold lineitem read costs ~10 s by itself) and with two
    // passes the min can still be half-cold.
    val (sf10Results, sf10Pipeline, sf10Scaled) =
      if (haveSf10) {
        val Seq(a, b) =
          cell(cpus, sf10Dir, Seq(tpch -> 3, sf10PipelineSet -> 2), sf10Probe)
        val Seq(c) = cell(fewCpus, sf10Dir, Seq(sf10ScaledSet -> 2), sf10Probe)
        (a, b, c)
      } else (Seq.empty, Seq.empty, Seq.empty)

    def tierJson(label: String, dir: String, res: Seq[(String, Double)],
        pipe: Seq[(String, Double)], sc: Seq[(String, Double)]): String =
      s""","$label":{"dir":"$dir","total":${r3(res.map(_._2).sum)},"queries":${toJson(res)},"pipeline":${toJson(pipe)},"scaling":{"cpus":$fewCpus,"queries":${toJson(sc)}}}"""

    val sf1Section = if (haveSf1) tierJson("sf1", sf1Dir, sf1Results, sf1Pipeline, sf1Scaled) else ""
    val sf10Section = if (haveSf10) tierJson("sf10", sf10Dir, sf10Results, sf10Pipeline, sf10Scaled) else ""
    println(s"""{"metric":"total","value":${r3(results.map(_._2).sum)},"unit":"sec","queries":${toJson(results)},"pipeline":${toJson(pipeline)},"scaling":{"cpus":$fewCpus,"queries":${toJson(scaled)}},"sf":"$sfDir"$sf1Section$sf10Section}""")
  }
}
