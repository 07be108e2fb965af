package graft

/** Dev timing loop: `runMain graft.DevBench <sfDir> <n> <query>[,query...]`
  * runs each named query n times against the noop sink in one session and
  * prints per-run wall times — the quick feedback loop for plan work
  * (Bench.scala stays the driver-facing single-JSON-line contract).
  */
object DevBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val n = args(1).toInt
    val names = args(2).split(',').toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Engine.build(master = s"local[$cpus]", shufflePartitions = cpus.toInt)
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to n).foreach { i =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(f"[devbench] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
    }
    spark.stop()
  }
}
