package graft

/** Edit-economics measurement for the LSM-shaped segmented indexes at a
  * given tier — the numbers SCALE.md's retract rows quote. For each axis
  * it prices the full loop: one-time base build, the edit (tombstone
  * write + delta segment), the composed probe, the compaction fold, and
  * the probe over the compacted base. The claim under test: retract +
  * append ≪ init (the edit rides |delta|, the base is never rewritten),
  * and compact ≈ init (a base rewrite, paid only when the edit history's
  * probe overhead outgrows it).
  *
  *   runMain graft.LsmDev <sfDir> [cores] [axes]
  *
  * `axes` is a comma list of bm25,ann,dsir (default all three — dsir
  * rides along because its sf100 SCALE row uses the same dev pattern).
  */
object LsmDev {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cores = args.lift(1).map(_.toInt).getOrElse(32)
    val axes = args.lift(2).getOrElse("bm25,ann,dsir").split(",").toSet
    val spark = Engine.build(master = s"local[$cores]", shufflePartitions = cores)
    def timed(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[lsmdev] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    def reset(): Unit = { Engine.clearSwapCaches(spark); System.gc() }

    if (axes("bm25")) {
      val phases = scala.collection.mutable.Map.empty[String, Double]
      val st = queries.Ivm.bm25LsmBuild(spark, dir, (k, v) => phases(k) = v)
      phases.toSeq.sortBy(_._1).foreach { case (k, v) =>
        println(f"[lsmdev] bm25 $k: $v%.2fs")
      }
      reset()
      timed("bm25 probe (composed)") {
        queries.Ivm.bm25LsmProbe(spark, dir, st)
          .write.format("noop").mode("overwrite").save()
      }
      var cst: queries.Ivm.SegmentedIndexState = null
      timed("bm25 compact") { cst = queries.Ivm.bm25LsmCompact(spark, st) }
      reset()
      timed("bm25 probe (compacted)") {
        queries.Ivm.bm25LsmProbe(spark, dir, cst)
          .write.format("noop").mode("overwrite").save()
      }
      reset()
    }

    if (axes("ann")) {
      val phases = scala.collection.mutable.Map.empty[String, Double]
      val st = queries.Ivm.annRetractBuild(spark, dir, (k, v) => phases(k) = v)
      phases.toSeq.sortBy(_._1).foreach { case (k, v) =>
        println(f"[lsmdev] ann $k: $v%.2fs")
      }
      reset()
      timed("ann probe (composed)") {
        queries.Ivm.annRetractProbe(spark, dir, st)
          .write.format("noop").mode("overwrite").save()
      }
      var cst: queries.Ivm.SegmentedIndexState = null
      timed("ann compact") { cst = queries.Ivm.annCompact(spark, st) }
      reset()
      timed("ann probe (compacted)") {
        queries.Ivm.annRetractProbe(spark, dir, cst)
          .write.format("noop").mode("overwrite").save()
      }
      reset()
    }

    if (axes("dsir")) {
      // two passes each: pass 1 includes the posting-cache build, pass 2
      // is the warm floor — the same split every SCALE.md text row quotes
      (1 to 2).foreach { i =>
        timed(s"classify pass $i") {
          queries.Classify.classify(spark, dir)
            .write.format("noop").mode("overwrite").save()
        }
        System.gc()
      }
      (1 to 2).foreach { i =>
        timed(s"dsir pass $i") {
          queries.Classify.dsir(spark, dir)
            .write.format("noop").mode("overwrite").save()
        }
        System.gc()
      }
    }
    spark.stop()
  }
}
