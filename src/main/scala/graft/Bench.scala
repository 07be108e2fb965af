package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline TPC-H set (BASELINE.md) on
  * SPARK_GRAFT_SF_DIR and prints one JSON line. Results are fully
  * materialized via the noop sink so every operator in the plan runs
  * (a bare count() would let Spark skip projection work).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Engine.build(master = s"local[$cpus]", shufflePartitions = cpus.toInt)

    // Warm every query's codegen/classloading path on the smallest SF so
    // measured times are execution, not first-use compilation.
    queries.Tpch.benchmark.foreach { q =>
      try q.run(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }

    def timeOnce(s: SparkSession)(q: QueryDef): Double = {
      val t0 = System.nanoTime()
      try q.run(s, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] ${q.name} failed: $e") }
      (System.nanoTime() - t0) / 1e9
    }
    // best-of-3: later runs reuse warmed file listings/codegen, and the
    // min damps scheduler noise on a shared machine
    val results = queries.Tpch.benchmark.map { q =>
      q.name -> Seq.fill(3)(timeOnce(spark)(q)).min
    }
    // LLM-pipeline throughput evidence (single pass, not part of the
    // headline metric): dedup, clustering, ANN, curation at the same SF.
    val pipeline = Seq(
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
      .map(q => q.name -> timeOnce(spark)(q))

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
      q.name -> math.min(timeOnce(sparkFew)(q), timeOnce(sparkFew)(q))
    }

    def toJson(kvs: Seq[(String, Double)]): String =
      kvs.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":${toJson(results)},"pipeline":${toJson(pipeline)},"scaling":{"cpus":$fewCpus,"queries":${toJson(scaled)}},"sf":"$sfDir"}""")
    sparkFew.stop()
  }
}
