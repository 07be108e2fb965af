package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the beyond-long q1 path: with spark.graft.q1.decimalSum=true the
  * aggregation accumulates in Decimal(38,0) (exact to ~1e27 rows — the
  * 100 TB-safe accumulator) instead of raw longs. Both paths finalize
  * through the same Tpch.unscaled cast-then-divide sequence (the
  * oracle's own rounding order), so their results must be BIT-identical
  * wherever the long path is in contract — asserted here row by row,
  * which is what lets Q1HeadroomSpec prescribe the flag as the remedy
  * when a tier outgrows the long accumulator.
  */
class Q1DecimalPathSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("q1 decimal-accumulator path is bit-identical to the long path") {
    val sf = "/root/testdata/sf0.01"
    val longRows = queries.Tpch.q1.run(spark, sf).collect()
    spark.conf.set("spark.graft.q1.decimalSum", "true")
    try {
      val decRows = queries.Tpch.q1.run(spark, sf).collect()
      assert(longRows.length == decRows.length)
      longRows.zip(decRows).foreach { case (l, d) => assert(l == d, s"$l != $d") }
    } finally spark.conf.unset("spark.graft.q1.decimalSum")
  }
}
