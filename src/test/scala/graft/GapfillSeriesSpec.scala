package graft

import org.scalatest.funsuite.AnyFunSuite

/** evt_gapfill_series (the library surface, no global sort) must stay
  * row-for-row identical to evt_gapfill (the oracle-checked def) once a
  * total order is imposed — the split is ORDERING ONLY. If the two plans
  * ever diverge in values, the rows-only allowance in SparkEntrySpec
  * would otherwise hide it from the driver's hash gate. */
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
