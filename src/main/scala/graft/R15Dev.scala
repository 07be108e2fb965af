package graft

/** Interleaved same-session A/Bs for the r15 optimization candidates
  * (machine contention hits both arms equally; see TokBenchDev for the
  * pattern).
  *
  *   runMain graft.R15Dev <sfDir> <which> [passes]
  *
  * which = tok | sh | write
  *   tok:   unigram posting aggregate (the tok_tf cache build) vs its
  *          explode-only lower bound (what removing the aggregate
  *          exchange could save at most)
  *   sh:    dedup_sh shingle relation — arrays-through-window (current)
  *          vs text-through-window (narrower exchange+sort payload)
  *   write: bigram posting index write — aggregate-then-repartition
  *          (two exchanges, current) vs repartition-then-aggregate (one
  *          exchange), plus the doclen arm: posting re-aggregate vs
  *          per-row size projection
  */
object R15Dev {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val which = args(1)
    val n = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = Engine.build()
    Engine.table(spark, dir, "documents").createOrReplaceTempView("documents")
    import org.apache.spark.sql.functions._

    def timeNoop(name: String, i: Int)(df: org.apache.spark.sql.DataFrame): Unit = {
      System.gc()
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[r15dev] $name pass $i: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }

    val arms: Seq[(String, () => org.apache.spark.sql.DataFrame)] = which match {
      case "tok" => Seq(
        "agg(current)" -> (() => spark.sql(
          """SELECT doc_id, token, count(*) AS tf FROM (
            |  SELECT doc_id, explode(word_ngrams(lower(text), 1)) AS token
            |  FROM documents) t
            |GROUP BY doc_id, token""".stripMargin)),
        "explode-only(bound)" -> (() => spark.sql(
          """SELECT doc_id, explode(word_ngrams(lower(text), 1)) AS token
            |FROM documents""".stripMargin)))
      case "sh" => Seq(
        "arrays-thru-window(current)" -> (() => spark.sql(
          s"""SELECT doc_id, fp, shingles,
             |  doc_id = min(doc_id) OVER (PARTITION BY fp) AS is_rep,
             |  sort_array(transform(shingles, x -> xxhash64(x))) AS hshingles
             |FROM (
             |  SELECT doc_id, md5(text) AS fp,
             |    sort_array(array_distinct(word_ngrams(text, 3))) AS shingles
             |  FROM documents WHERE size(word_ngrams(text, 3)) > 0)""".stripMargin)),
        "text-thru-window" -> (() => spark.sql(
          s"""SELECT doc_id, fp, shingles, is_rep,
             |  sort_array(transform(shingles, x -> xxhash64(x))) AS hshingles
             |FROM (
             |  SELECT doc_id, fp,
             |    sort_array(array_distinct(word_ngrams(text, 3))) AS shingles, is_rep
             |  FROM (
             |    SELECT doc_id, fp, text,
             |      doc_id = min(doc_id) OVER (PARTITION BY fp) AS is_rep
             |    FROM (SELECT doc_id, md5(text) AS fp, text FROM documents)))
             |WHERE size(shingles) > 0""".stripMargin)))
      case "write" => Seq(
        "agg-then-repart(current)" -> (() => spark.sql(
          """SELECT doc_id, token, count(*) AS tf FROM (
            |  SELECT doc_id, explode(word_ngrams(lower(text), 2)) AS token
            |  FROM documents) t
            |GROUP BY doc_id, token""".stripMargin)
          .repartition(col("token")).sortWithinPartitions("token")),
        "repart-then-agg" -> (() => spark.sql(
          """SELECT doc_id, explode(word_ngrams(lower(text), 2)) AS token
            |FROM documents""".stripMargin)
          .repartition(col("token"))
          .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
          .sortWithinPartitions("token")),
        "doclen-from-postings(current)" -> (() => spark.sql(
          """SELECT doc_id, sum(tf) AS dl FROM (
            |  SELECT doc_id, token, count(*) AS tf FROM (
            |    SELECT doc_id, explode(word_ngrams(lower(text), 2)) AS token
            |    FROM documents) t
            |  GROUP BY doc_id, token) p
            |GROUP BY doc_id""".stripMargin)),
        "doclen-per-row" -> (() => spark.sql(
          """SELECT doc_id, CAST(size(word_ngrams(lower(text), 2)) AS BIGINT) AS dl
            |FROM documents WHERE size(word_ngrams(lower(text), 2)) > 0""".stripMargin)))
      case "prof" =>
        // component split of the bigram BM25 one-shot: kernel pass alone,
        // cache materialization, dl roll-up, then the score over warm
        // caches — where do the seconds go?
        Seq(
          "kernel-pass-noop" -> (() => spark.sql(
            """SELECT doc_id, inline(word_ngram_tfs(lower(text), 2))
              |FROM documents""".stripMargin)),
          "kernel-pass-repart" -> (() => spark.sql(
            """SELECT doc_id, inline(word_ngram_tfs(lower(text), 2))
              |FROM documents""".stripMargin)
            .repartition(32, col("doc_id"))),
          "repart-then-kernel" -> (() => spark.sql("SELECT doc_id, text FROM documents")
            .repartition(32, col("doc_id"))
            .selectExpr("doc_id", "inline(word_ngram_tfs(lower(text), 2))")))
      case "prof2" =>
        // the bigram BM25 one-shot, split at its seams: cache
        // materialization (count forces it), the dl roll-up, the score
        // over warm caches, and the score's two cache scans
        def bg(): Unit = queries.TextAnalysis.bigramPostings(spark, "documents")
        Seq(
          "btok-cache-build" -> (() => {
            Engine.clearSwapCaches(spark); System.gc()
            bg(); spark.table("btok_tf")
          }),
          "dl-over-warm" -> (() => {
            bg()
            spark.sql("SELECT doc_id, sum(tf) AS dl FROM btok_tf GROUP BY doc_id")
          }),
          "score-over-warm" -> (() => queries.TextAnalysis.bm25Bigram(spark, dir)),
          "one-shot" -> (() => {
            Engine.clearSwapCaches(spark); System.gc()
            queries.TextAnalysis.bm25Bigram(spark, dir)
          }))
      case other => sys.error(s"unknown probe: $other")
    }
    // warm codegen on each arm once
    arms.foreach { case (_, mk) =>
      mk().write.format("noop").mode("overwrite").save()
    }
    (1 to n).foreach { i =>
      arms.foreach { case (name, mk) => timeNoop(name, i)(mk()) }
    }
    spark.stop()
  }
}
