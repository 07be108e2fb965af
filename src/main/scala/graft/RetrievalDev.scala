package graft

/** Split write/probe timing for the stored BM25 index — the cold-start
  * serving question `ta_bm25_indexed`'s in-cell number can't answer
  * (the census cell rebuilds the index every invocation, so the write
  * dominates; production pays the write once and probes many times).
  *
  *   runMain graft.RetrievalDev <sfDir> [passes] [cores]
  */
object RetrievalDev {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val n = args.lift(1).map(_.toInt).getOrElse(3)
    val cores = args.lift(2).map(_.toInt).getOrElse(32)
    val spark = Engine.build(master = s"local[$cores]", shufflePartitions = cores)
    val idx = Engine.scratchDir("graft_bm25_dev_") + "/index"
    var t0 = System.nanoTime()
    queries.TextAnalysis.writeBm25Index(spark, dir, idx)
    println(f"[retrievaldev] index write: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    // drop the in-session posting cache: the probe must serve cold-start,
    // from storage only
    Engine.clearSwapCaches(spark)
    System.gc()
    // Materialize the 8-row query batch OUTSIDE the timed region (ADVICE
    // r12): probing through the corpus temp view re-read and re-tokenized
    // the query side inside every timed pass, inflating the steady-state
    // probe number with work a serving deployment does once per batch.
    val qRows = spark.sql(
      "SELECT doc_id AS query_id, text FROM documents WHERE doc_id < 8").collect()
    val q = spark.createDataFrame(
      spark.sparkContext.parallelize(qRows.toIndexedSeq, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("query_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType))))
    (1 to n).foreach { i =>
      t0 = System.nanoTime()
      queries.TextAnalysis.probeBm25Index(spark, idx, q, excludeSelf = true)
        .write.format("noop").mode("overwrite").save()
      println(f"[retrievaldev] probe pass $i: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      System.gc()
    }
    spark.stop()
  }
}
