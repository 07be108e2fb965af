package graft

/** Plan-evidence harness for the optimization rounds:
  * `runMain graft.PlanDump <sfDir> <outDir> [names] [suffix]` writes each
  * census query's `.explain("formatted")` output to
  * `<outDir>/<name>_<suffix>.txt` (suffix defaults to `before`).
  * `names` is a comma-separated filter; `all` (default) dumps every
  * declared query. Queries that materialize an index while CONSTRUCTING
  * their DataFrame (the *_indexed compositions) pay that build here; the
  * dump itself never executes the final plan, so the files record plan
  * shape (Exchange count, join strategy, PushedFilters/ReadSchema), not
  * timings.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val out = java.nio.file.Paths.get(args(1))
    java.nio.file.Files.createDirectories(out)
    val names =
      if (args.length > 2 && args(2) != "all") args(2).split(",").toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val suffix = args.lift(3).getOrElse("before")
    val spark = Engine.build()
    val qs = SparkEntry.queries
    names.foreach { name =>
      try {
        val df = qs(name)(spark, dir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(out.resolve(s"${name}_$suffix.txt"),
          txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        println(s"[plandump] $name ok (${txt.linesIterator.count(_.contains("Exchange"))} Exchange refs)")
      } catch { case e: Throwable =>
        // nextOption: an empty rendered exception must not throw
        // NoSuchElementException and mask the original failure (ADVICE r14)
        println(s"[plandump] $name FAILED: " +
          e.toString.linesIterator.nextOption().getOrElse(e.getClass.getName).take(160))
      }
      Engine.clearSwapCaches(spark)
    }
    spark.stop()
  }
}
