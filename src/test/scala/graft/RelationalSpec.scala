package graft

import org.scalatest.funsuite.AnyFunSuite

class RelationalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("every relational op runs and returns a well-formed result") {
    queries.Relational.all.foreach { q =>
      val df = q.run(spark, sf)
      assert(df.columns.nonEmpty, q.name)
      assert(df.count() >= 0, q.name)
    }
  }

  test("op_single returns exactly one row with the computed literal") {
    val r = queries.Relational.single.run(spark, sf).collect()
    assert(r.length == 1 && r(0).getInt(0) == 2 && r(0).isNullAt(2))
  }

  test("op_limit honors offset+limit against total order") {
    val keys = queries.Relational.limit.run(spark, sf)
      .collect().map(_.getLong(0))
    assert(keys.length == 7)
    assert(keys.sameElements(keys.sorted))
  }

  test("op_group_global_empty yields one row: count 0, sum NULL") {
    val r = queries.Relational.groupGlobalEmpty.run(spark, sf).collect()
    assert(r.length == 1 && r(0).getLong(0) == 0L && r(0).isNullAt(1))
  }

  test("op_join_null_keys: NULL keys never match themselves") {
    val rows = queries.Relational.joinNullKeys.run(spark, sf).collect()
    // suppliers with s_nationkey=3 are nulled out; they must not join
    val s = Engine.table(spark, sf, "supplier")
      .filter(org.apache.spark.sql.functions.col("s_nationkey") === 3)
      .select("s_suppkey").collect().map(_.getLong(0)).toSet
    assert(rows.forall(r => !s.contains(r.getLong(0)) && !s.contains(r.getLong(1))))
  }

  test("op_union_all keeps duplicates (bag semantics)") {
    val n = queries.Relational.unionAll.run(spark, sf).count()
    val regions = Engine.table(spark, sf, "region").count()
    val nations = Engine.table(spark, sf, "nation").count()
    assert(n == 2 * regions + nations)
  }

  test("op_insert: duplicate appends survive as a multiset") {
    val rows = queries.Relational.insert.run(spark, sf).collect()
    assert(rows.nonEmpty && rows.forall(_.getAs[Long]("copies") == 2L))
  }

  test("op_filescan_csv parses quoted delimiter into JSON array column") {
    val rows = queries.Relational.fileScan.run(spark, sf)
      .collect().map(_.getString(0))
    assert(rows.sameElements(Array(
      """["123","abc","12.1"]""", """["456","d,ef","13.2"]""")))
  }
}
