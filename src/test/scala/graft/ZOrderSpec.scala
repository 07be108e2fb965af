package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the zorder64 kernel (bit-exact vs a per-bit reference interleave)
  * and the property the expression exists for: z-ordered file layout
  * bounds BOTH key spans per file, where a single-key sort bounds one and
  * scatters the other.
  */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def refInterleave(x: Long, y: Long): Long = {
    var z = 0L
    for (i <- 0 until 32) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
    }
    z
  }

  test("zorder64 matches the per-bit reference interleave on seeded randoms") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val pairs = Seq.fill(200)((rnd.nextLong().abs & 0xFFFFFFFFL,
      rnd.nextLong().abs & 0xFFFFFFFFL)) :+ ((0L, 0L)) :+
      ((0xFFFFFFFFL, 0xFFFFFFFFL))
    val got = pairs.toDF("x", "y")
      .selectExpr("x", "y", "zorder64(x, y) AS z").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (x, y, z) => assert(z == refInterleave(x, y)) }
    // de-interleaving recovers both keys: the curve loses nothing
    assert(got.map(_._3).distinct.length == got.map(t => (t._1, t._2)).distinct.length)
  }

  test("z-ordered layout bounds both key spans per file; single-key sort does not") {
    import org.apache.spark.sql.functions._
    // 64×64 grid, one row per cell, laid out into 16 "files" (range
    // partitions) two ways; measure the mean per-file span of each key
    val grid = spark.range(64L * 64)
      .selectExpr("CAST(id / 64 AS BIGINT) AS a", "CAST(id % 64 AS BIGINT) AS b")

    def meanSpans(sortCol: String): (Double, Double) = {
      val parts = grid.selectExpr("a", "b", s"$sortCol AS k")
        .repartitionByRange(16, col("k"))
        .sortWithinPartitions("k")
        .select(col("a"), col("b"), spark_partition_id().as("pid"))
        .groupBy("pid")
        .agg((max("a") - min("a")).as("sa"), (max("b") - min("b")).as("sb"))
        .collect()
      (parts.map(_.getLong(1)).sum.toDouble / parts.length,
        parts.map(_.getLong(2)).sum.toDouble / parts.length)
    }

    val (zA, zB) = meanSpans("zorder64(a, b)")
    val (sA, sB) = meanSpans("a * 64 + b") // lexicographic (single-key) sort
    // lexicographic: a is tightly bounded but b spans the full 0..63 in
    // every file; z-order: both spans bounded well under the full range
    assert(sB > 60.0, s"lexicographic secondary span should be ~63, got $sB")
    assert(zA <= 24.0 && zB <= 24.0,
      s"z-order spans should be bounded on both dims, got ($zA, $zB)")
    assert(zB < sB / 2, "z-order must at least halve the secondary-key span")
    assert(sA <= zA, "single-key sort stays tighter on its own key")
  }
}
