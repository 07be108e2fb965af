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

    // Warm the JVM/codegen paths once on the smallest SF so measured times
    // are query time, not first-use classloading.
    queries.Tpch.benchmark.headOption.foreach { q =>
      try q.run(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }

    val results = queries.Tpch.benchmark.map { q =>
      val t0 = System.nanoTime()
      try q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] ${q.name} failed: $e") }
      q.name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
