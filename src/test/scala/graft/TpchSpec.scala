package graft

import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark = Engine.build(master = "local[8]", shufflePartitions = 8)
}

class TpchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("q1_agg groups and aggregates lineitem") {
    val rows = queries.Tpch.q1.run(spark, sf).collect()
    assert(rows.length > 0 && rows.length <= 9) // |returnflag| x |linestatus| combos
    val count = rows.map(_.getAs[Long]("count_order")).sum
    assert(count > 0 && count <= 6000)
  }

  test("q3_topn returns at most 10 ordered rows") {
    val rows = queries.Tpch.q3.run(spark, sf).collect()
    assert(rows.length <= 10)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.sameElements(revs.sorted.reverse))
  }

  test("q5_join aggregates per nation") {
    val rows = queries.Tpch.q5.run(spark, sf).collect()
    assert(rows.length >= 0) // may be empty at tiny SF; must not throw
  }

  test("q6_filter is a single global aggregate row") {
    val rows = queries.Tpch.q6.run(spark, sf).collect()
    assert(rows.length == 1)
  }

  test("q10_join returns top customers") {
    val rows = queries.Tpch.q10.run(spark, sf).collect()
    assert(rows.length <= 20 && rows.length > 0)
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
