package graft

/** One-off adjudication tool: print a census query's final (AQE) plan
  * under two values of a runtime conf, to attribute a plan change to a
  * session-config change.
  *
  *   runMain graft.PlanDiffDev <sfDir> <query> <confKey> <v1> <v2>
  */
object PlanDiffDev {
  def main(args: Array[String]): Unit = {
    val (dir, name, key) = (args(0), args(1), args(2))
    val spark = Engine.build()
    val q = SparkEntry.queries(name)
    Seq(args(3), args(4)).foreach { v =>
      spark.conf.set(key, v)
      Engine.clearSwapCaches(spark)
      val df = q(spark, dir)
      df.write.format("noop").mode("overwrite").save()
      println(s"===== $key = $v =====")
      // executedPlan AFTER execution reflects AQE's final decisions
      println(df.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Join") || l.contains("Sort") || l.contains("Exchange"))
        .mkString("\n"))
    }
    spark.stop()
  }
}
