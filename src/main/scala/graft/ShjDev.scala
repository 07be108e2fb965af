package graft

/** Adjudication harness for the shuffled-hash-join local-map cap
  * (OPTIMIZATION r15 / VERDICT r14 #2): executes the named TPC-H queries
  * against `<sfDir>` and prints each query's FINAL adaptive plan (the
  * initial `explain` shows `isFinalPlan=false` — AQE's SMJ→SHJ
  * conversion only appears in the executed plan) plus per-pass wall
  * times.
  *
  *   runMain graft.ShjDev <sfDir> [names] [passes] [outDir]
  *
  * Run twice with SPARK_GRAFT_SHJ_THRESHOLD=64m / 256m for the A/B; the
  * final plans land in `<outDir>/<name>_shj<threshold>.txt`.
  */
object ShjDev {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args.lift(1).getOrElse("q3_topn,q5_join,q10_join").split(",").toSeq
    val n = args.lift(2).map(_.toInt).getOrElse(3)
    val outDir = args.lift(3).map(java.nio.file.Paths.get(_))
    outDir.foreach(java.nio.file.Files.createDirectories(_))
    val thr = sys.env.getOrElse("SPARK_GRAFT_SHJ_THRESHOLD", "64m")
    val spark = Engine.build()
    val qs = SparkEntry.queries
    // warm codegen/file listings the way a Bench cell does
    names.foreach(nm => qs(nm)(spark, "/root/testdata/sf0.001")
      .write.format("noop").mode("overwrite").save())
    println(f"[shjdev] threshold=$thr cal=${{
      val t0 = System.nanoTime()
      spark.range(2000000000L).selectExpr("sum(id)").collect()
      (System.nanoTime() - t0) / 1e9
    }}%.3f")
    names.foreach { nm =>
      val times = (1 to n).map { i =>
        val df = qs(nm)(spark, dir)
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t = (System.nanoTime() - t0) / 1e9
        System.gc()
        t
      }
      // the FINAL adaptive plan: collect() executes on the DataFrame's
      // own QueryExecution (TPC-H outputs are tiny), so executedPlan now
      // prints isFinalPlan=true with any AQE join rewrites applied —
      // df.write would plan a separate QueryExecution and leave `df`'s
      // plan initial
      outDir.foreach { o =>
        val df = qs(nm)(spark, dir)
        df.collect()
        java.nio.file.Files.write(o.resolve(s"${nm}_shj$thr.txt"),
          df.queryExecution.executedPlan.toString
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
      println(f"[shjdev] $nm@$dir thr=$thr: " +
        times.map(t => f"$t%.3f").mkString(" ") + f" min=${times.min}%.3f")
    }
    spark.stop()
  }
}
