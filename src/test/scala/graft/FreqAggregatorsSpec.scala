package graft

import graft.functions.FreqAggregators
import org.scalatest.funsuite.AnyFunSuite

class FreqAggregatorsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("freqAvg: apply with freq, retraction, empty -> None") {
    import spark.implicits._
    // (10.0 x3) + (20.0 x1) → avg 12.5
    val ds = Seq((10.0, 3L), (20.0, 1L)).toDS()
    val got = ds.select(FreqAggregators.freqAvg.toColumn).collect()(0)
    assert(got.contains(12.5))

    // retraction back to a single value
    val retracted = Seq((10.0, 3L), (20.0, 1L), (10.0, -3L)).toDS()
      .select(FreqAggregators.freqAvg.toColumn).collect()(0)
    assert(retracted.contains(20.0))

    // full retraction → empty group → None (matches NULL avg semantics)
    val empty = Seq((10.0, 2L), (10.0, -2L)).toDS()
      .select(FreqAggregators.freqAvg.toColumn).collect()(0)
    assert(empty.isEmpty)
  }

  test("freqAvg agrees with the IVM layer on real data grouped by key") {
    import spark.implicits._
    val li = Engine.table(spark, "/root/testdata/sf0.001", "lineitem")
    val typed = li.selectExpr("l_returnflag", "l_quantity", "CAST(1 AS BIGINT) AS freq")
      .as[(String, Double, Long)]
    val got = typed.groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(FreqAggregators.freqAvg.toColumn)
      .collect().toMap
    val exp = li.groupBy("l_returnflag")
      .agg(org.apache.spark.sql.functions.avg("l_quantity"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    got.foreach { case (k, v) =>
      assert(math.abs(v.get - exp(k)) < 1e-9, s"key $k: $v vs ${exp(k)}")
    }
  }

  test("freqCount sums frequencies incl. negatives") {
    import spark.implicits._
    val n = Seq(1L, 2L, -1L, 5L).toDS()
      .select(FreqAggregators.freqCount.toColumn).collect()(0)
    assert(n == 7L)
  }
}
