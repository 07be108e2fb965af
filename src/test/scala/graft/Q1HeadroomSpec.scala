package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Guard for q1's long fixed-point exactness contract. Finalization
  * (Tpch.unscaled) replays the oracle's own cast-then-divide rounding
  * sequence — bit-identical for any sum a long can hold — so the ONLY way
  * q1 can drift from the oracle is the accumulator overflowing at 2^63;
  * this spec asserts a 2× safety margin (2^62) on the ACTUAL per-group
  * scale-6 charge sums at the largest scale factor present under BOTH
  * /root/testdata (driver-generated) and /root/repo/benchdata (GenData
  * tiers — round 6's spec missed these, so the contract was unverified
  * exactly where the bench runs). At the SF where this fails, set
  * spark.graft.q1.decimalSum=true — the Decimal(38,0) accumulator path
  * Q1DecimalPathSpec pins as result-identical.
  */
class Q1HeadroomSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def largestSf(root: String): Option[java.io.File] = {
    val dirs = Option(new java.io.File(root).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("sf") &&
        new java.io.File(f, "lineitem.parquet").exists)
    if (dirs.isEmpty) None
    else Some(dirs.maxBy(f => f.getName.drop(2).toDouble))
  }

  test("q1 scale-6 charge sums keep 2x margin under 2^63 at the largest SF of every tier root") {
    val tiers = Seq("/root/testdata", "/root/repo/benchdata").flatMap(largestSf)
    assert(tiers.nonEmpty, "no lineitem tier found to measure")
    val limit = 1L << 62
    tiers.foreach { dir =>
      val li = Engine.table(spark, dir.toString, "lineitem")
      val maxAbsSum = li
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(abs(sum(queries.Tpch.chargeScaled6)).as("s"))
        .agg(max(col("s"))).head().getLong(0)
      assert(maxAbsSum < limit,
        s"scaled q1 sum $maxAbsSum within 2x of long overflow at $dir — " +
          "switch to spark.graft.q1.decimalSum=true (Decimal accumulator)")
      info(f"$dir: max scaled sum $maxAbsSum%,d — " +
        f"headroom factor ${limit.toDouble / maxAbsSum}%.1f under 2^62")
    }
  }
}
