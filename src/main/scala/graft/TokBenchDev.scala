package graft

/** Within-session A/B for the r14 word_ngrams kernel vs the
  * higher-order-function tokenization it replaced: times the full
  * bigram posting aggregate (tokenize → explode → two-level hash agg →
  * noop) under both spellings, interleaved in ONE session so external
  * machine contention hits both arms equally.
  *
  *   runMain graft.TokBenchDev <sfDir> [passes]
  */
object TokBenchDev {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val n = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = Engine.build()
    Engine.table(spark, dir, "documents").createOrReplaceTempView("documents")
    val hof =
      """SELECT doc_id, token, count(*) AS tf FROM (
        |  SELECT doc_id, explode(CASE WHEN size(tk) < 2 THEN array()
        |    ELSE zip_with(slice(tk, 1, size(tk) - 1), slice(tk, 2, size(tk) - 1),
        |                  (a, b) -> concat(a, ' ', b)) END) AS token
        |  FROM (SELECT doc_id, filter(split(lower(text), ' '), x -> x <> '') AS tk
        |        FROM documents)) t
        |GROUP BY doc_id, token""".stripMargin
    val kern =
      """SELECT doc_id, token, count(*) AS tf FROM (
        |  SELECT doc_id, explode(word_ngrams(lower(text), 2)) AS token
        |  FROM documents) t
        |GROUP BY doc_id, token""".stripMargin
    // warm both codegen paths once
    Seq(hof, kern).foreach(q =>
      spark.sql(q).write.format("noop").mode("overwrite").save())
    (1 to n).foreach { i =>
      Seq("hof" -> hof, "kernel" -> kern).foreach { case (name, q) =>
        System.gc()
        val t0 = System.nanoTime()
        spark.sql(q).write.format("noop").mode("overwrite").save()
        println(f"[tokbench] $name pass $i: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
    }
    spark.stop()
  }
}
