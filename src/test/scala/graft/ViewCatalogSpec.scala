package graft

import graft.sql.GraftSession
import org.scalatest.funsuite.AnyFunSuite

/** Durable views: the reference stores view SQL text in its catalog and
  * re-inlines it per connection (catalog/src/lib.rs:176+,
  * resolve_tables.rs:35-58); here CREATE VIEW persists the dialect SQL
  * under the view-catalog dir and a fresh GraftSession replays it.
  * Divergence pinned below: replay resolves eagerly at session start, so
  * a view over absent base tables is skipped with a warning instead of
  * erroring at query time.
  */
class ViewCatalogSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def freshSession(dir: String): GraftSession = {
    val s = spark.newSession()
    Engine.registerAll(s, sf)
    new GraftSession(s, dir)
  }

  test("CREATE VIEW survives into a new session; DROP VIEW is durable too") {
    val dir = java.nio.file.Files.createTempDirectory("graft_views_").toString
    Engine.registerAll(spark, sf)
    val gs1 = new GraftSession(spark, dir)
    gs1.sql("create view v_persist as select r_regionkey, r_name from region where r_regionkey < 3")
    assert(gs1.sql("select count(*) c from v_persist").collect()(0).getLong(0) == 3)

    // brand-new session (empty temp-view namespace) + fresh GraftSession
    val gs2 = freshSession(dir)
    assert(gs2.sql("select count(*) c from v_persist").collect()(0).getLong(0) == 3)

    gs2.sql("drop view v_persist")
    val gs3 = freshSession(dir)
    val err = intercept[Exception](gs3.sql("select * from v_persist").collect())
    assert(err.getMessage.toLowerCase.contains("v_persist"))
    // DROP VIEW IF EXISTS: silent no-op on the now-absent name, and a
    // REAL drop (registry + file) when the view exists — the bare temp
    // view must not resurrect it on the next statement
    gs3.sql("drop view if exists v_persist")
    gs3.sql("create view v_persist as select 3 as x")
    gs3.sql("drop view if exists v_persist")
    val err2 = intercept[Exception](gs3.sql("select * from v_persist").collect())
    assert(err2.getMessage.toLowerCase.contains("v_persist"))
  }

  test("chained views replay in creation order; dialect rewrites re-apply") {
    val dir = java.nio.file.Files.createTempDirectory("graft_views_").toString
    Engine.registerAll(spark, sf)
    val gs1 = new GraftSession(spark, dir)
    gs1.sql("create view v_base as select n_nationkey, n_name from nation limit 0, 10")
    gs1.sql("create view v_chain as select count(*) c from v_base")
    val gs2 = freshSession(dir)
    assert(gs2.sql("select * from v_chain").collect()(0).getLong(0) == 10)
  }

  test("CREATE OR REPLACE semantics: latest definition wins across sessions") {
    val dir = java.nio.file.Files.createTempDirectory("graft_views_").toString
    Engine.registerAll(spark, sf)
    val gs1 = new GraftSession(spark, dir)
    gs1.sql("create view v_replace as select 1 as x")
    // the explicit OR REPLACE spelling routes through the scoped catalog
    // too (falling through to raw Spark would create a metastore view)
    gs1.sql("create or replace view v_replace as select 2 as x")
    val gs2 = freshSession(dir)
    assert(gs2.sql("select x from v_replace").collect()(0).getInt(0) == 2)
    // exactly one catalog file remains for the name (db-scoped stem)
    val files = new java.io.File(dir).list().count(_.endsWith(".v_replace.sql"))
    assert(files == 1)
  }

  test("qualified view name over a system table joins with a user table (views/mod.rs)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_views_").toString
    val gs = new GraftSession(spark, dir)
    gs.sql("drop table if exists vc_test")
    val loc = new java.io.File("spark-warehouse/vc_test")
    if (loc.exists()) { loc.listFiles().foreach(_.delete()); loc.delete() }
    gs.sql("create table vc_test (c TEXT)")
    spark.sql("INSERT INTO vc_test VALUES ('vc_test')")
    // db-qualified view name: owned by `default`, so the bare reference
    // below resolves because the session database matches
    gs.sql("""create view default.vc_test_view as
             |select name as table_name from incresql.tables
             |where database_name = 'default'""".stripMargin)
    val rows = gs.sql(
      "SELECT * FROM vc_test JOIN vc_test_view ON c = table_name")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.toSeq == Seq(("vc_test", "vc_test")))
    gs.sql("drop view default.vc_test_view")
    gs.sql("drop table vc_test")
  }

  test("views/mod.rs verbatim: context-scoped view over bare `tables` under USE incresql") {
    val dir = java.nio.file.Files.createTempDirectory("graft_views_").toString
    val gs = new GraftSession(spark, dir)
    gs.sql("drop table if exists test")
    val loc = new java.io.File("spark-warehouse/test")
    if (loc.exists()) { loc.listFiles().foreach(_.delete()); loc.delete() }
    // the reference test sequence, statement for statement
    gs.sql("CREATE TABLE test (c TEXT)")
    gs.sql("""INSERT INTO test VALUES ("tables")""")
    gs.sql("use incresql")
    gs.sql("create view default.test_view as select name as table_name from tables")
    gs.sql("use default")
    val rows = gs.sql("SELECT * FROM test JOIN test_view ON c=table_name")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(rows == Seq(("tables", "tables")))
    // sql_context round-trips: a fresh session replays the view with its
    // stored incresql context, so bare `tables` resolves again
    val s2 = spark.newSession()
    val gs2 = new GraftSession(s2, dir)
    val rows2 = gs2.sql("SELECT table_name FROM test_view WHERE table_name = 'tables'")
      .collect().map(_.getString(0)).toSeq
    assert(rows2 == Seq("tables"))
    assert(s2.catalog.currentDatabase == "default", "replay must restore the session db")
    gs.sql("drop view test_view")
    gs.sql("drop table test")
  }

  test("views are database-scoped: bare name only in the owning db, qualified anywhere") {
    val dir = java.nio.file.Files.createTempDirectory("graft_views_").toString
    Engine.registerAll(spark, sf)
    val gs = new GraftSession(spark, dir)
    spark.sql("DROP DATABASE IF EXISTS graft_scope_db CASCADE")
    gs.sql("create database graft_scope_db")
    try {
      gs.sql("use graft_scope_db")
      gs.sql("create view v_scoped as select r_name from region where r_regionkey = 0")
      // owning database: bare resolves, with the default alias usable
      assert(gs.sql("select v_scoped.r_name from v_scoped").collect()(0)
        .getString(0) == "AFRICA")
      gs.sql("use default")
      // other database: bare does NOT resolve...
      val err = intercept[Exception](gs.sql("select * from v_scoped").collect())
      assert(err.getMessage.contains("v_scoped"))
      // ...but the qualified name does, from anywhere
      assert(gs.sql("select r_name from graft_scope_db.v_scoped").collect()(0)
        .getString(0) == "AFRICA")
      // the catalog lists the view under its owning database with its
      // stored SQL text and sql_context, like the reference's tables table
      val row = gs.sql(
        """select database_name, sql, sql_context from incresql.tables
          |where name = 'v_scoped'""".stripMargin).collect()(0)
      assert(row.getString(0) == "graft_scope_db")
      assert(row.getString(1).startsWith("select r_name from region"))
      assert(row.getString(2) == "graft_scope_db")
      // scoping survives into a fresh session
      val gs2 = freshSession(dir)
      assert(gs2.sql("select r_name from graft_scope_db.v_scoped").collect()(0)
        .getString(0) == "AFRICA")
      val err2 = intercept[Exception](gs2.sql("select * from v_scoped").collect())
      assert(err2.getMessage.contains("v_scoped"))
      gs.sql("drop view graft_scope_db.v_scoped")
    } finally {
      gs.sql("use default")
      spark.sql("DROP DATABASE IF EXISTS graft_scope_db CASCADE")
    }
  }

  test("comma cross-join view bodies replay; db.view.col qualifiers resolve") {
    val dir = java.nio.file.Files.createTempDirectory("graft_views_").toString
    Engine.registerAll(spark, sf)
    val gs1 = new GraftSession(spark, dir)
    gs1.sql("create view v_cc_a as select 1 as x")
    gs1.sql("create view v_cc_b as select 2 as y")
    // comma cross-join list: the bare names resolve through the synced
    // bare temp views, a position the FROM/JOIN pin can't reach
    gs1.sql("create view v_cc as select * from v_cc_a, v_cc_b")
    assert(gs1.sql("select x, y from v_cc").collect()(0).toSeq == Seq(1, 2))
    // a fresh session must replay all three (the comma refs resolve
    // because replay syncs the context database's bare views first)
    val gs2 = freshSession(dir)
    assert(gs2.sql("select x, y from v_cc").collect()(0).toSeq == Seq(1, 2))
    // fully-qualified column references collapse to the default alias
    assert(gs2.sql("select default.v_cc.x from default.v_cc").collect()(0)
      .getInt(0) == 1)
    Seq("v_cc", "v_cc_a", "v_cc_b").foreach(v => gs2.sql(s"drop view $v"))
  }

  test("DROP DATABASE CASCADE removes the database's views everywhere") {
    val dir = java.nio.file.Files.createTempDirectory("graft_views_").toString
    val gs = new GraftSession(spark, dir)
    spark.sql("DROP DATABASE IF EXISTS graft_casc_db CASCADE")
    gs.sql("create database graft_casc_db")
    gs.sql("use graft_casc_db")
    gs.sql("create view v_gone as select 1 as x")
    gs.sql("use default")
    gs.sql("drop database graft_casc_db cascade")
    // no ghost: catalog row gone, file gone, qualified reference dead
    assert(gs.sql(
      "select * from incresql.tables where name = 'v_gone'").collect().isEmpty)
    assert(!new java.io.File(dir).list().exists(_.contains("v_gone")))
    val err = intercept[Exception](
      gs.sql("select * from graft_casc_db.v_gone").collect())
    assert(err != null)
    // and a fresh session replays nothing from it
    val gs2 = freshSession(dir)
    val err2 = intercept[Exception](
      gs2.sql("select * from graft_casc_db.v_gone").collect())
    assert(err2 != null)
  }

  test("DROP DATABASE refuses while scoped views remain (check_db_empty)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_views_").toString
    val gs = new GraftSession(spark, dir)
    spark.sql("DROP DATABASE IF EXISTS graft_nodrop_db CASCADE")
    gs.sql("create database graft_nodrop_db")
    try {
      gs.sql("use graft_nodrop_db")
      gs.sql("create view v_hold as select 1 as x")
      gs.sql("use default")
      val err = intercept[IllegalArgumentException](
        gs.sql("drop database graft_nodrop_db"))
      assert(err.getMessage.contains("not empty"))
      gs.sql("drop view graft_nodrop_db.v_hold")
      gs.sql("drop database graft_nodrop_db") // empty now: succeeds
    } finally {
      gs.sql("use default")
      spark.sql("DROP DATABASE IF EXISTS graft_nodrop_db CASCADE")
    }
  }

  test("bootstrap databases exist: USE incresql round-trips") {
    val gs = new GraftSession(spark,
      java.nio.file.Files.createTempDirectory("graft_views_").toString)
    gs.sql("use incresql")
    assert(gs.sql("select database()").collect()(0).getString(0) == "incresql")
    gs.sql("use default")
  }

  test("a view over absent base tables is skipped with a warning, not fatal") {
    val dir = java.nio.file.Files.createTempDirectory("graft_views_").toString
    Engine.registerAll(spark, sf)
    val gs1 = new GraftSession(spark, dir)
    gs1.sql("create view v_orphan as select r_regionkey from region")
    // a session with NO base tables registered: construction must succeed
    val bare = new GraftSession(spark.newSession(), dir)
    assert(bare.sql("select 1 as ok").collect()(0).getInt(0) == 1)
  }
}
