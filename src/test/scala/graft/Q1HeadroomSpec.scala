package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Guard for q1's long fixed-point exactness contract: the scale-6
  * charge sums are bit-identical to the oracle's DECIMAL→DOUBLE cast only
  * while every per-group scaled sum stays below 2^53 (above it neither
  * long→double nor DuckDB's cast is guaranteed correctly rounded to the
  * same ULP). This spec measures the ACTUAL max at the LARGEST scale
  * factor present under /root/testdata, so new driver-generated SFs are
  * checked automatically — at the SF where this fails, q1's sum_charge
  * must move to a scale-4 intermediate or a Decimal accumulator.
  */
class Q1HeadroomSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("q1 scale-6 charge sums stay under 2^53 at the largest available SF") {
    val largest = new java.io.File("/root/testdata").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("sf"))
      .maxBy(f => f.getName.drop(2).toDouble)
    val li = Engine.table(spark, largest.toString, "lineitem")
    val maxAbsSum = li
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(abs(sum(queries.Tpch.chargeScaled6)).as("s"))
      .agg(max(col("s"))).head().getLong(0)
    val limit = 1L << 53
    assert(maxAbsSum < limit,
      s"scaled q1 sum $maxAbsSum exceeds 2^53 at ${largest.getName} — " +
        "long→double exactness contract broken; narrow the charge scale")
    info(f"${largest.getName}: max scaled sum $maxAbsSum%,d — " +
      f"headroom factor ${limit.toDouble / maxAbsSum}%.1f")
  }
}
