package graft

/** Scratch SQL probe for plan/profile investigation:
  * `runMain graft.SqlDev <sfDir> <sql> [n]` registers every testdata
  * table plus the dedup shingle/rare-index caches (the relations the
  * dedup family's CTEs read), then times the statement n times (noop
  * sink) and prints the first rows. Dev-only — nothing in the library
  * or the census calls this.
  */
object SqlDev {
  def main(args: Array[String]): Unit = {
    val spark = Engine.build()
    val dir = args(0)
    val sql = args(1)
    val n = args.lift(2).map(_.toInt).getOrElse(2)
    Engine.allTables.foreach { t =>
      if (new java.io.File(s"$dir/$t.parquet").exists)
        Engine.table(spark, dir, t).createOrReplaceTempView(t)
    }
    queries.Dedup.cachedShingles(spark, dir)
    queries.Dedup.cachedRareIndex(spark)
    (1 to n).foreach { i =>
      val t0 = System.nanoTime()
      spark.sql(sql).write.format("noop").mode("overwrite").save()
      println(f"[sqldev] pass $i: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.sql(sql).show(20, truncate = false)
    spark.stop()
  }
}
