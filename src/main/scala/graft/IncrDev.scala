package graft

/** Dev loop for the incremental probe's fixed-size-delta asymptote:
  * `runMain graft.IncrDev <sfDir> [deltaMod] [n] [cores] [mode]` times n
  * passes with the delta slice shrunk to `doc_id % deltaMod = 0`. The
  * census keys bind deltaMod=10 (delta = corpus/10, so the benched cells
  * grow with the corpus); a production delta is a fixed-size crawl
  * batch, and this knob measures that regime — e.g. deltaMod=1000 at
  * sf100 probes a 5 k-doc batch against a ~5 M-doc index, isolating the
  * index-scan + probe cost SCALE.md's sf100 section quotes. Prints
  * delta/index doc counts so the measured configuration is part of the
  * record. mode `inflight` (default) runs
  * [[queries.Dedup.incrementalPairs]] — both sides' signatures derived
  * per pass; mode `indexed` runs the [[queries.Dedup.writeBandIndex]]
  * ingest once (timed separately — the amortized cost) and then n
  * [[queries.Dedup.probeBandIndex]] passes against storage, the
  * steady-state admission cost.
  */
object IncrDev {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val deltaMod = args.lift(1).map(_.toInt).getOrElse(1000)
    val n = args.lift(2).map(_.toInt).getOrElse(3)
    val cores = args.lift(3).map(_.toInt).getOrElse(32)
    val mode = args.lift(4).getOrElse("inflight")
    val spark = Engine.build(master = s"local[$cores]", shufflePartitions = cores)
    val sides = Engine.table(spark, dir, "documents")
      .selectExpr(s"sum(CAST(doc_id % $deltaMod = 0 AS INT)) AS delta", "count(*) AS total")
      .head()
    println(s"[incrdev] mode=$mode deltaMod=$deltaMod delta=${sides.getLong(0)} index=${sides.getLong(1) - sides.getLong(0)}")
    def timed(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[incrdev] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    if (mode == "indexed") {
      val idx = java.nio.file.Files
        .createTempDirectory("graft_incrdev_index_").resolve("index").toString
      timed("index write (once, at ingest)") {
        queries.Dedup.writeBandIndex(spark, dir, idx, deltaMod)
      }
      (1 to n).foreach { i =>
        timed(s"stored-index probe pass $i") {
          queries.Dedup.probeBandIndex(spark, dir, idx, deltaMod = deltaMod)
            .write.format("noop").mode("overwrite").save()
        }
      }
    } else {
      (1 to n).foreach { i =>
        timed(s"incremental pass $i") {
          queries.Dedup.incrementalPairs(spark, dir, deltaMod = deltaMod)
            .write.format("noop").mode("overwrite").save()
        }
      }
    }
    spark.stop()
  }
}
