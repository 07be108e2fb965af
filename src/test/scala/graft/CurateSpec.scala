package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CurateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("curation pipeline filters, dedups, and keeps one member of every near-dup pair") {
    val total = Engine.table(spark, sf, "documents").count()
    val curated = queries.Curate.curatedCorpus(spark, sf)
    val rows = curated.collect()
    assert(rows.nonEmpty && rows.length <= total)

    // quality gates hold
    rows.foreach { r =>
      assert(r.getAs[Int]("n_tokens") >= 5)
      assert(r.getAs[Double]("distinct_ratio") >= 0.2)
    }

    // for every strong near-dup pair, the lower id survives, the higher
    // id is gone (unless itself filtered by quality gates)
    val pairs = queries.Dedup.minhashPairs(spark, sf, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val kept = rows.map(_.getLong(0)).toSet
    pairs.foreach { case (_, b) => assert(!kept.contains(b), s"dup loser $b survived") }
    assert(pairs.nonEmpty, "corpus should contain near-dups for this test to bite")
  }

  test("cross-database view inlining (tests/views/mod.rs:3-31)") {
    val gs = new graft.sql.GraftSession(spark)
    spark.sql("DROP DATABASE IF EXISTS graft_vdb CASCADE")
    gs.sql("create database graft_vdb")
    try {
      gs.sql("use graft_vdb")
      gs.sql("create table vt (c TEXT)")
      gs.sql("""insert into vt values ('tables')""")
      // bare CREATE VIEW owns the view to the current database
      // (graft_vdb); from default it resolves only via the qualifier
      gs.sql("create view graft_tv as select c as table_name from graft_vdb.vt")
      gs.sql("use default")
      val rows = gs.sql(
        """select t.table_name from graft_vdb.graft_tv t
          |join (select 'tables' as n) s on t.table_name = s.n""".stripMargin).collect()
      assert(rows.length == 1 && rows(0).getString(0) == "tables")
      // the bare name does NOT leak across databases (reference scoping)
      val err = intercept[Exception](
        gs.sql("select * from graft_tv").collect())
      assert(err.getMessage.contains("graft_tv"))
    } finally {
      gs.sql("use default")
      try gs.sql("drop view graft_vdb.graft_tv") catch { case _: Exception => () }
      spark.sql("DROP DATABASE IF EXISTS graft_vdb CASCADE")
    }
  }
}
