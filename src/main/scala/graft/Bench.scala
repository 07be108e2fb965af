package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline TPC-H set (BASELINE.md) on
  * SPARK_GRAFT_SF_DIR and prints one JSON line. Results are fully
  * materialized via the noop sink so every operator in the plan runs
  * (a bare count() would let Spark skip projection work).
  *
  * When the generated sf1 directory exists (graft.GenData — 10× the
  * driver's sf0.1, join-preserving key offsets), the same sets run
  * there too and land in an "sf1" JSON section: round 5 proved sf0.1
  * deltas under ~30% are scheduler noise (a byte-identical build moved
  * −18%), so sf1 is where plan regressions are actually measurable.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val sf1Dir = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "/root/repo/benchdata/sf1")
    val haveSf1 = new java.io.File(s"$sf1Dir/lineitem.parquet").exists
    // sf10 carries TPC-H plus documents (GenData table filter): the
    // headline set still sits near the scheduling floor at sf1, and at
    // sf1 the document pipelines are overhead-dominated too (minhash
    // 8-core beat 32-core there) — sf10 docs is where banding/explode
    // shapes become compute-bound. events/embeddings stay sf1-only:
    // their heavy shapes (window, gapfill, ANN) already scale at sf1.
    val sf10Dir = sys.env.getOrElse("SPARK_GRAFT_SF10_DIR", "/root/repo/benchdata/sf10")
    val haveSf10 = new java.io.File(s"$sf10Dir/lineitem.parquet").exists
    val haveSf10Docs = new java.io.File(s"$sf10Dir/documents.parquet").exists
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Engine.build(master = s"local[$cpus]", shufflePartitions = cpus.toInt)

    // Warm every query's codegen/classloading path on the smallest SF so
    // measured times are execution, not first-use compilation.
    queries.Tpch.benchmark.foreach { q =>
      try q.run(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }

    def timeOnce(s: SparkSession, dir: String)(q: QueryDef): Double = {
      val t0 = System.nanoTime()
      try q.run(s, dir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] ${q.name} failed: $e") }
      (System.nanoTime() - t0) / 1e9
    }
    // best-of-3: later runs reuse warmed file listings/codegen, and the
    // min damps scheduler noise on a shared machine
    val results = queries.Tpch.benchmark.map { q =>
      q.name -> Seq.fill(3)(timeOnce(spark, sfDir)(q)).min
    }
    // LLM-pipeline throughput evidence (single pass, not part of the
    // headline metric): dedup, clustering, ANN, curation at the same SF.
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
    // Probe-only IVF timing: ann_ivf_indexed builds its index inside the
    // query (write-time + probe-time in one number). A serving path pays
    // the build once and probes many times, so the probe against a
    // pre-built index — the partition-pruned scan AnnIndexSpec pins — is
    // measured separately (best-of-2 over one build).
    def ivfProbeTime(s: SparkSession, dir: String): Double = {
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
    val pipeline = pipelineSet.map(q => q.name -> timeOnce(spark, sfDir)(q)) :+
      ("ann_ivf_probe" -> ivfProbeTime(spark, sfDir))

    // sf1 on the full-core session: TPC-H best-of-2 plus the heavy
    // pipeline shapes (shuffle-heavy banding, explode+agg, merge-walk
    // verification, window/generate).
    val sf1PipelineSet = Seq(
      queries.Dedup.minhash, queries.Dedup.incremental,
      queries.Dedup.containment,
      queries.Dedup.clusters, queries.TextAnalysis.tfidf,
      queries.Events.gapfill)
    val sf1Results =
      if (haveSf1) queries.Tpch.benchmark.map { q =>
        q.name -> Seq.fill(2)(timeOnce(spark, sf1Dir)(q)).min
      } else Seq.empty
    // best-of-2, matching the 8-core side's discipline so the scaling
    // ratio compares like with like (a single cold pass at sf1 reads
    // slower than a min-of-2 warm pair on a quarter of the cores)
    val sf1Pipeline =
      if (haveSf1) sf1PipelineSet.map { q =>
        q.name -> Seq.fill(2)(timeOnce(spark, sf1Dir)(q)).min
      } :+ ("ann_ivf_probe" -> ivfProbeTime(spark, sf1Dir))
      else Seq.empty

    // best-of-3 at sf10: the 1.5 GB tier is page-cache-sensitive (a cold
    // lineitem read costs ~10 s by itself), and with only two passes the
    // min can still be half-cold — measured spread 2.8 s vs 5.7 s for q5
    // across identical builds
    val sf10Results =
      if (haveSf10) queries.Tpch.benchmark.map { q =>
        q.name -> Seq.fill(3)(timeOnce(spark, sf10Dir)(q)).min
      } else Seq.empty
    // the two pipeline shapes that are overhead-dominated below sf10:
    // shuffle-heavy banding (minhash) and explode+agg (tfidf)
    val sf10PipelineSet = Seq(queries.Dedup.minhash, queries.TextAnalysis.tfidf)
    val sf10Pipeline =
      if (haveSf10Docs) sf10PipelineSet.map { q =>
        q.name -> Seq.fill(2)(timeOnce(spark, sf10Dir)(q)).min
      } else Seq.empty

    // Core-count scaling evidence: the 100×-scale claims rest on plan
    // shape; rerunning the headline set on a quarter of the cores (fresh
    // context, shuffle partitions matched) catches any future
    // parallelism-hostile plan — a healthy plan degrades roughly with
    // core count, a driver-bound or skewed one doesn't.
    spark.stop()
    val fewCpus = math.max(4, cpus.toInt / 4)
    val sparkFew = Engine.build(master = s"local[$fewCpus]", shufflePartitions = fewCpus)
    // pipeline representatives ride along: shuffle-heavy (minhash),
    // explode+agg (tfidf), and window/generate (gapfill) shapes must all
    // degrade roughly with cores, like the TPC-H set
    val scaledSet = queries.Tpch.benchmark ++
      Seq(queries.Dedup.minhash, queries.TextAnalysis.tfidf, queries.Events.gapfill)
    val scaled = scaledSet.map { q =>
      q.name -> math.min(timeOnce(sparkFew, sfDir)(q), timeOnce(sparkFew, sfDir)(q))
    }
    // At sf1 the work is an order of magnitude above the scheduling
    // floor, so 8-vs-32-core ratios finally mean something.
    val sf1ScaledSet = queries.Tpch.benchmark.filter(q =>
      q.name == "q1_agg" || q.name == "q5_join") ++
      Seq(queries.Dedup.minhash, queries.TextAnalysis.tfidf)
    val sf1Scaled =
      if (haveSf1) sf1ScaledSet.map { q =>
        q.name -> math.min(timeOnce(sparkFew, sf1Dir)(q), timeOnce(sparkFew, sf1Dir)(q))
      } else Seq.empty
    val sf10ScaledSet = queries.Tpch.benchmark.filter(q =>
      q.name == "q1_agg" || q.name == "q5_join") ++
      (if (haveSf10Docs) sf10PipelineSet else Seq.empty)
    val sf10Scaled =
      if (haveSf10) sf10ScaledSet.map { q =>
        q.name -> math.min(timeOnce(sparkFew, sf10Dir)(q), timeOnce(sparkFew, sf10Dir)(q))
      } else Seq.empty
    sparkFew.stop()

    def toJson(kvs: Seq[(String, Double)]): String =
      kvs.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val sf1Section =
      if (haveSf1) {
        val sf1Total = sf1Results.map(_._2).sum
        s""","sf1":{"dir":"$sf1Dir","total":$sf1Total,"queries":${toJson(sf1Results)},"pipeline":${toJson(sf1Pipeline)},"scaling":{"cpus":$fewCpus,"queries":${toJson(sf1Scaled)}}}"""
      } else ""
    val sf10Section =
      if (haveSf10) {
        val sf10Total = sf10Results.map(_._2).sum
        s""","sf10":{"dir":"$sf10Dir","total":$sf10Total,"queries":${toJson(sf10Results)},"pipeline":${toJson(sf10Pipeline)},"scaling":{"cpus":$fewCpus,"queries":${toJson(sf10Scaled)}}}"""
      } else ""
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":${toJson(results)},"pipeline":${toJson(pipeline)},"scaling":{"cpus":$fewCpus,"queries":${toJson(scaled)}},"sf":"$sfDir"$sf1Section$sf10Section}""")
  }
}
