package graft

/** Standalone isolation timing for any census query:
  * `runMain graft.QueryDev <sfDir> <name>[,<name>...] [n] [cores] [keep]` runs
  * each named query n times in ONE fresh session (pass 1 pays cache
  * builds; later passes are the steady-state floor Bench's best-of-N
  * reports) with EXACTLY a Bench cell's cache discipline: swap caches
  * released + full GC between QUERIES, kept across one query's n passes.
  * Pass a 5th arg to change it: `clear` releases between every pass
  * (per-pass rebuild cost), `keep` never releases (all-caches-resident
  * floor). This is the adjudication tool SCALE.md's
  * measurement-hygiene section calls for: when a bench cell number looks
  * off, the question is whether the WARM FLOOR moved, not what the min
  * of two contended samples says — this prints every pass so the floor
  * is visible.
  */
object QueryDev {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args(1).split(",").toSeq
    val n = args.lift(2).map(_.toInt).getOrElse(3)
    val cores = args.lift(3).map(_.toInt).getOrElse(32)
    val mode = args.lift(4).getOrElse("cell") // cell | clear | keep
    val spark = Engine.build(master = s"local[$cores]", shufflePartitions = cores)
    val qs = SparkEntry.queries
    names.foreach { name =>
      val q = qs.getOrElse(name, sys.error(s"unknown query: $name"))
      (1 to n).foreach { i =>
        val t0 = System.nanoTime()
        q(spark, dir).write.format("noop").mode("overwrite").save()
        println(f"[querydev] $name pass $i: ${(System.nanoTime() - t0) / 1e9}%.2fs")
        // Bench's inter-pass discipline (r11): a full GC lets the
        // ContextCleaner drop the previous pass's shuffle files — without
        // it a big query's passes ACCUMULATE spill until the disk fills
        // (the sf100 ngram pass-2 failure mode), which measures the
        // harness, not the plan. `clear` additionally drops the caches.
        if (mode == "clear") Engine.clearSwapCaches(spark)
        System.gc()
      }
      if (mode == "cell") { Engine.clearSwapCaches(spark); System.gc() }
    }
    spark.stop()
  }
}
