package graft

import org.scalatest.funsuite.AnyFunSuite

/** The funnel diagnostic duplicates the containment pipeline's candidate
  * and verification SQL (it must, to count the stages the real query
  * fuses); this spec keeps the copy honest: stage counts must be
  * monotone, non-trivial at the smallest SF, and the verified-pair count
  * must agree with the REAL pipeline's rep-level pair count — if the
  * pipeline's thresholds, df cap, or rep collapse change without the
  * diagnostic following, this fails. */
class ContainmentFunnelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("funnel stages are monotone and agree with the pipeline's rep pairs") {
    val (cand, prelim, rpairs) = queries.Dedup.containmentFunnel(spark, sf)
    assert(cand > 0, "no candidates at sf0.001 — the index side of the diagnostic broke")
    assert(cand >= prelim && prelim >= rpairs,
      s"funnel not monotone: cand=$cand prelim=$prelim rpairs=$rpairs")
    // the real query = rep pairs expanded to copies + within-group pairs;
    // count its REP-level component the same way the funnel does: distinct
    // (rep_a, rep_b) pairs whose both endpoints are reps, via the
    // fingerprint join the expansion uses.
    val out = queries.Dedup.containmentPairs(spark, sf)
    out.createOrReplaceTempView("cont_out")
    val repPairs = spark.sql(
      """SELECT count(*) FROM (
        |  SELECT DISTINCT o.id_a, o.id_b
        |  FROM cont_out o
        |  JOIN dedup_sh a ON o.id_a = a.doc_id AND a.is_rep
        |  JOIN dedup_sh b ON o.id_b = b.doc_id AND b.is_rep
        |  WHERE o.c_ab < 1.0 OR o.c_ba < 1.0)""".stripMargin).head().getLong(0)
    assert(rpairs >= repPairs,
      s"funnel rpairs=$rpairs lost pairs the pipeline reports ($repPairs rep-level)")
  }
}
