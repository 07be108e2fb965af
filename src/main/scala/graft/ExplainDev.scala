package graft
object ExplainDev {
  def main(args: Array[String]): Unit = {
    val spark = Engine.build(master = "local[4]", shufflePartitions = 4)
    args.tail.foreach { name =>
      val df = SparkEntry.queries(name)(spark, args(0))
      println(s"===== $name =====")
      println(df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
