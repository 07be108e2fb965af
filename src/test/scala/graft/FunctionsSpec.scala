package graft

import graft.sql.GraftSession
import org.scalatest.funsuite.AnyFunSuite

class FunctionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("approximate aggregates stay within error bounds of exact") {
    val r = queries.Functions.approx.run(spark, sf).collect()(0)
    val approx = r.getAs[Long]("approx_orders").toDouble
    val exact = r.getAs[Long]("exact_orders").toDouble
    assert(math.abs(approx - exact) / exact < 0.05,
      s"approx_count_distinct off by ${math.abs(approx - exact) / exact}")
    val median = r.getAs[Double]("median_qty")
    assert(median >= 1.0 && median <= 50.0)
    val p95 = r.getAs[Double]("p95_price")
    val max = Engine.table(spark, sf, "lineitem")
      .agg(org.apache.spark.sql.functions.max("l_extendedprice"))
      .collect()(0).getDouble(0)
    assert(p95 <= max && p95 > 0)
  }

  test("@@ magic vars and database() dialect substitution") {
    val gs = new GraftSession(spark)
    val r = gs.sql("SELECT @@max_allowed_packet, @@socket, database()").collect()(0)
    assert(r.getInt(0) == 16777215)
    assert(r.getString(1) == "")
    assert(r.getString(2).nonEmpty)
  }

  test("EXPLAIN returns a formatted plan relation") {
    val gs = new GraftSession(spark)
    Engine.registerAll(spark, sf)
    val lines = gs.sql("EXPLAIN SELECT count(*) FROM lineitem")
      .collect().map(_.getString(0))
    assert(lines.exists(_.contains("HashAggregate")))
    assert(lines.exists(_.contains("Scan parquet")))
  }
}
