package graft

import graft.sql.GraftSession
import org.scalatest.funsuite.AnyFunSuite

class FunctionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("approximate aggregates stay within error bounds of exact") {
    val r = queries.Functions.approx.run(spark, sf).collect()(0)
    assert(r.getAs[Long]("exact_orders") > 0)
    // The query itself now emits the bound checks (the DuckDB oracle pins
    // them to TRUE) — the spec asserts they hold at this SF too.
    assert(r.getAs[Boolean]("hll_within_2pct"))
    assert(r.getAs[Boolean]("median_in_band"))
    assert(r.getAs[Boolean]("p95_in_band"))
  }

  test("@@ magic vars and database() dialect substitution") {
    val gs = new GraftSession(spark)
    val r = gs.sql("SELECT @@max_allowed_packet, @@socket, database()").collect()(0)
    assert(r.getInt(0) == 16777215)
    assert(r.getString(1) == "")
    assert(r.getString(2).nonEmpty)
  }

  test("EXPLAIN is reference-format; EXPLAIN FORMATTED is Spark's physical plan") {
    val gs = new GraftSession(spark)
    Engine.registerAll(spark, sf)
    // bare EXPLAIN: the reference's 4-column tree (ExplainGoldenSpec pins
    // the exact format; here just the dispatch)
    val tree = gs.sql("EXPLAIN SELECT count(*) FROM lineitem")
      .collect().map(_.getString(0))
    assert(tree.head == "GROUP")
    assert(tree.exists(_.contains("TABLE(lineitem)")))
    val lines = gs.sql("EXPLAIN FORMATTED SELECT count(*) FROM lineitem")
      .collect().map(_.getString(0))
    assert(lines.exists(_.contains("HashAggregate")))
    assert(lines.exists(_.contains("Scan parquet")))
  }
}
