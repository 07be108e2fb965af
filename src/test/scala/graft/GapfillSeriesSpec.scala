package graft

import org.scalatest.funsuite.AnyFunSuite

/** The gapfillSeries LIBRARY surface (no global sort) must stay
  * row-for-row identical to evt_gapfill (the fully-ordered def) once a
  * total order is imposed — the split is ORDERING ONLY. The census key
  * evt_gapfill_series hash-compares a per-user digest of this plan
  * (r12); this spec keeps the stronger row-level claim pinned so a
  * digest collision could never mask a divergence. */
class GapfillSeriesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("library series equals oracle-checked gapfill after total ordering") {
    val lib = queries.Events.gapfillSeries(spark, sf)
      .orderBy("user_id", "hour_start").collect()
    val ver = queries.Events.gapfill.run(spark, sf).collect()
    assert(lib.length == ver.length && lib.sameElements(ver),
      s"series/gapfill diverged: ${lib.length} vs ${ver.length} rows")
  }
}
