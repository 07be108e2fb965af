package graft

/** Dev loop for the containment candidate funnel:
  * `runMain graft.FunnelDev <sfDir> [n]` times n full-query passes in one
  * session (pass 1 pays the shingle + rare-index cache builds; later
  * passes are the steady-state cost Bench's best-of-N reports) and prints
  * the candidate → prelim → verified funnel counts that SCALE.md quotes.
  */
object FunnelDev {
  def main(args: Array[String]): Unit = {
    val spark = Engine.build()
    val dir = args(0)
    val n = args.lift(1).map(_.toInt).getOrElse(3)
    (1 to n).foreach { i =>
      val t0 = System.nanoTime()
      queries.Dedup.containmentPairs(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"[funneldev] containment pass $i: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    val f = queries.Dedup.containmentFunnel(spark, dir)
    println(s"[funneldev] funnel: cand=${f._1} prelim=${f._2} rpairs=${f._3}")
    spark.stop()
  }
}
