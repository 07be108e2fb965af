package graft

import graft.queries.Curate
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the per-source document cap (`pipeline_source_cap`): the
  * salted two-phase selection must be LOSSLESS (identical to the naive
  * one-window-per-source spelling it replaces for scale), the cap must
  * bind exactly, and the plan must actually run the salted window first
  * — the whole point is that no window partition ever holds an entire
  * hot source.
  */
class SourceCapSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def runOn(docs: Seq[(Long, String)]): Seq[(Long, String, Int)] = {
    val dir = java.nio.file.Files.createTempDirectory("graft_srccap_").toString
    import spark.implicits._
    docs.map { case (id, src) => (id, s"text $id", "en", src, 10L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Curate.sourceCap(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq
  }

  test("two-phase salted selection equals the naive single window on a skewed corpus") {
    // one giant source (400 docs), several small ones — the shape that
    // breaks the naive window at scale and exercises every salt bucket
    val docs = (0L until 400L).map(i => (i, "giant")) ++
      (400L until 408L).map(i => (i, "small8")) ++
      (408L until 418L).map(i => (i, "exactly10")) ++
      (418L until 430L).map(i => (i, "twelve"))
    val got = runOn(docs)

    // naive reference: one window over source, same hash priority
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_srccap_ref_").toString
    docs.map { case (id, src) => (id, s"text $id", "en", src, 10L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Engine.table(spark, dir, "documents").createOrReplaceTempView("documents")
    val expected = spark.sql(
      s"""SELECT doc_id, source, rn FROM (
         |  SELECT doc_id, source, row_number() OVER (PARTITION BY source
         |    ORDER BY ${Dedup60.hash("concat('p_', CAST(doc_id AS STRING))")},
         |             doc_id) AS rn
         |  FROM documents) t WHERE rn <= 10
         |ORDER BY source, rn""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq
    assert(got == expected,
      "salted two-phase selection diverged from the single-window reference")
  }

  test("the cap binds: per-source kept counts are min(n_source, cap)") {
    val docs = (0L until 400L).map(i => (i, "giant")) ++
      (400L until 403L).map(i => (i, "tiny"))
    val got = runOn(docs).groupBy(_._2).view.mapValues(_.size).toMap
    assert(got == Map("giant" -> 10, "tiny" -> 3), s"kept counts: $got")
    // and ranks are a contiguous 1..k per source
    runOn(docs).groupBy(_._2).foreach { case (src, rows) =>
      assert(rows.map(_._3).sorted == (1 to rows.size), s"ranks not contiguous for $src")
    }
  }

  test("plan: the corpus-sized window is salted; only survivors hit the per-source window") {
    val p = Curate.sourceCap(spark, "/root/testdata/sf0.001")
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    val windows = """\(\d+\) Window\n""".r.findAllIn(p).size
    assert(windows == 2, s"expected the two-phase window pair, plan has $windows")
    assert(p.contains("salt"),
      "the first window lost its salt key — a hot source would collapse into one partition")
    // Spark's rank-filter pushdown (WindowGroupLimit) must prune each
    // salted partition to its cap BEFORE rows reach the row_number sort —
    // this is what keeps phase 1's exchange output at salts·cap per source
    assert(p.contains("WindowGroupLimit"),
      "rank filter no longer prunes as a partial top-k inside the salted partitions")
    // no document bodies anywhere in this plan: id + source columns only
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!read.contains("text"), s"cap selection reads document bodies: $read")
  }
}

/** Test-local access to the portable hash spelling (kept private[queries]
  * in Dedup — specs live in package graft, not graft.queries). */
private object Dedup60 {
  def hash(x: String): String =
    s"CAST(conv(substr(md5($x), 1, 15), 16, 10) AS BIGINT)"
}
