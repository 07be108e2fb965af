package graft

/** Dev loop for the incremental probe's fixed-size-delta asymptote:
  * `runMain graft.IncrDev <sfDir> [deltaMod] [n] [cores]` times n passes
  * of [[queries.Dedup.incrementalPairs]] with the delta slice shrunk to
  * `doc_id % deltaMod = 0`. The census key binds deltaMod=10 (delta =
  * corpus/10, so the benched cell grows with the corpus); a production
  * delta is a fixed-size crawl batch, and this knob measures that
  * regime — e.g. deltaMod=1000 at sf100 probes a 5 k-doc batch against
  * a ~5 M-doc index, isolating the index-scan + probe cost SCALE.md's
  * sf100 section quotes. Prints delta/index doc counts so the measured
  * configuration is part of the record.
  */
object IncrDev {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val deltaMod = args.lift(1).map(_.toInt).getOrElse(1000)
    val n = args.lift(2).map(_.toInt).getOrElse(3)
    val cores = args.lift(3).map(_.toInt).getOrElse(32)
    val spark = Engine.build(master = s"local[$cores]", shufflePartitions = cores)
    val sides = Engine.table(spark, dir, "documents")
      .selectExpr(s"sum(CAST(doc_id % $deltaMod = 0 AS INT)) AS delta", "count(*) AS total")
      .head()
    println(s"[incrdev] deltaMod=$deltaMod delta=${sides.getLong(0)} index=${sides.getLong(1) - sides.getLong(0)}")
    (1 to n).foreach { i =>
      val t0 = System.nanoTime()
      queries.Dedup.incrementalPairs(spark, dir, deltaMod = deltaMod)
        .write.format("noop").mode("overwrite").save()
      println(f"[incrdev] incremental pass $i: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
