package graft

/** Probe-only ANN serving split at a big tier (the census keys write the
  * index inside the cell, so their numbers are write-dominated — this is
  * the adjudication tool for the STEADY-STATE comparison the bench
  * probe cells commit at sf0.1/sf1/sf10):
  *   `runMain graft.AnnProbeDev <sfDir> [n]`
  * writes the shared SQ8(+pv) index ONCE, then times n passes each of
  *   - the stored-code SQ8 probe (ann_sq8_probe's body),
  *   - the three-stage JL∘SQ8∘float probe (ann_rproj_sq8_probe's body),
  *   - the packed-code PQ/ADC probe (ann_pq_probe's body — the 16
  *     B/candidate scan),
  *   - the tombstone-composed retract probe (ivm_ann's probe half; its
  *     tombstone + delta segments are built once, outside the loop).
  * Caches are dropped between passes so every pass pays the real index
  * scan, not an in-memory replay.
  */
object AnnProbeDev {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val n = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = Engine.build(master = "local[32]", shufflePartitions = 32)
    val idx = Engine.scratchDir("graft_annprobe_") + "/index"
    var t0 = System.nanoTime()
    queries.Similarity.writeIvfSq8Index(spark, dir, idx)
    println(f"[annprobe] index write: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    val pqIdx = Engine.scratchDir("graft_annprobe_pq_") + "/index"
    t0 = System.nanoTime()
    queries.Similarity.writeIvfPqIndex(spark, dir, pqIdx)
    println(f"[annprobe] pq index write: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    val st = queries.Ivm.annRetractBuild(spark, dir,
      (k, v) => println(f"[annprobe] ivm_ann $k: $v%.2fs"))
    def time(label: String)(body: => org.apache.spark.sql.DataFrame): Unit =
      (1 to n).foreach { i =>
        Engine.clearSwapCaches(spark); System.gc()
        val t = System.nanoTime()
        body.write.format("noop").mode("overwrite").save()
        println(f"[annprobe] $label pass $i: ${(System.nanoTime() - t) / 1e9}%.2fs")
      }
    time("sq8_probe") { queries.Similarity.probeIvfSq8Index(spark, dir, idx) }
    time("rproj_sq8_probe") { queries.Similarity.probeRprojSq8Index(spark, dir, idx) }
    time("pq_probe") { queries.Similarity.probeIvfPqIndex(spark, dir, pqIdx) }
    time("ivm_ann_probe") { queries.Ivm.annRetractProbe(spark, dir, st) }
    spark.stop()
  }
}
