package graft

/** Dev tool: print the formatted physical plan for one query (or the
  * benchmark set) so scan pushdown, broadcast choices, and codegen spans
  * can be audited. Usage:
  *   runMain graft.Explain [queryName] [sfDir]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("ALL")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val spark = Engine.build(master = "local[8]", shufflePartitions = 8)
    val defs =
      if (name == "ALL") queries.Tpch.benchmark
      else SparkEntry.allDefs.filter(_.name == name)
    defs.foreach { q =>
      println(s"\n========== ${q.name} ==========")
      q.run(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
