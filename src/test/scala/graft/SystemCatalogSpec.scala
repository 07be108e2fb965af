package graft

import graft.sql.GraftSession
import org.scalatest.funsuite.AnyFunSuite

/** Replays the reference's system-catalog tests against the GraftSession
  * shim: tests/building_blocks/tables.rs (SELECT FROM incresql.databases
  * in all four alias forms), tests/create/table.rs (incresql.tables
  * tracks CREATE/DROP), and the group/mod.rs EXPLAIN golden over a
  * system table. The bootstrap database rows (default, incresql,
  * information_schema — catalog/src/bootstrap.rs:22-24) are always
  * present; extra user databases may exist in a shared test session, so
  * the membership asserts are contains-based where the reference's are
  * exact.
  */
class SystemCatalogSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private lazy val gs = new GraftSession(spark)

  private def names(sql: String): Seq[String] =
    gs.sql(sql).collect().map(_.getString(0)).toSeq

  test("SELECT name FROM incresql.databases — all four reference alias forms") {
    val bootstrap = Set("default", "incresql", "information_schema")
    val plain = names("SELECT name FROM incresql.databases")
    assert(bootstrap.subsetOf(plain.toSet))
    assert(plain == plain.sorted, "rows come back in pk (name) order")
    // qualified by the default alias, like the reference's TableAlias
    assert(names("SELECT databases.name FROM incresql.databases") == plain)
    // user aliases, with and without AS
    assert(names("SELECT name FROM incresql.databases as foo") == plain)
    assert(names("SELECT foo.name FROM incresql.databases foo") == plain)
  }

  test("count over a system table; WHERE false yields the empty-group row") {
    val n = gs.sql("SELECT count(*) FROM incresql.databases").collect()(0).getLong(0)
    assert(n >= 3)
    val r = gs.sql(
      "select count(*), sum(1) from incresql.databases where false").collect()(0)
    assert(r.getLong(0) == 0L && r.isNullAt(1))
  }

  test("incresql.tables tracks CREATE TABLE and DROP TABLE (create/table.rs)") {
    gs.sql("drop table if exists sys_cat_t1")
    gs.sql("create table sys_cat_t1 (a INT, b TEXT, c DECIMAL(4,2), d BOOLEAN)")
    val rows = gs.sql(
      """SELECT database_name, name FROM incresql.tables where name = "sys_cat_t1"""")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(rows == Seq(("default", "sys_cat_t1")))
    gs.sql("drop table sys_cat_t1")
    assert(gs.sql(
      """SELECT database_name, name FROM incresql.tables where name = "sys_cat_t1"""")
      .collect().isEmpty)
    // the system tables list themselves, flagged system, with bootstrap ids
    val sys = gs.sql(
      "SELECT name, table_id, system FROM incresql.tables WHERE database_name = 'incresql' ORDER BY table_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(sys == Seq(("prefix_tables", 0L, true), ("databases", 2L, true), ("tables", 4L, true)))
  }

  test("SHOW TABLES lists the current database only (show/tables.rs golden)") {
    // under incresql: exactly the three system tables, in name order
    gs.sql("use incresql")
    try {
      val t = gs.sql("show tables").collect().map(_.getString(0)).toSeq
      assert(t == Seq("databases", "prefix_tables", "tables"))
    } finally gs.sql("use default")
    // a freshly created database lists nothing
    spark.sql("DROP DATABASE IF EXISTS graft_show_db CASCADE")
    gs.sql("create database graft_show_db")
    try {
      gs.sql("use graft_show_db")
      assert(gs.sql("show tables").collect().isEmpty)
    } finally {
      gs.sql("use default")
      spark.sql("DROP DATABASE IF EXISTS graft_show_db CASCADE")
    }
  }

  test("context temp views never surface as rows in incresql.tables") {
    gs.sql("use incresql")
    try {
      // 1st statement registers the bare context views; from the 2nd
      // statement on, refreshSystemView runs while they exist — the
      // listing must still only contain the reference's catalog rows
      gs.sql("select 1")
      val listed = gs.sql("select database_name, name, type from tables")
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(!listed.contains(("default", "databases")) &&
             !listed.contains(("default", "tables")),
        s"context temp views leaked into the catalog listing: $listed")
      // the REAL system rows are of course still there
      assert(listed.contains(("incresql", "databases")) &&
             listed.contains(("incresql", "tables")))
    } finally gs.sql("use default")
  }

  test("user temp views named databases/tables are shadowed, then restored") {
    spark.sql("SELECT 42 AS answer").createOrReplaceTempView("databases")
    spark.sql("SELECT 'mine' AS who").createOrReplaceTempView("tables")
    try {
      gs.sql("use incresql")
      // inside the context the names mean the system tables
      val cols = gs.sql("select * from databases").columns.toSeq
      assert(cols == Seq("name"), s"system view must win inside incresql: $cols")
      gs.sql("use default")
      // leaving restores the user's views verbatim, not deletes them
      val a = gs.sql("select answer from databases").collect()(0).getInt(0)
      assert(a == 42, "user view 'databases' must survive the context round-trip")
      val w = gs.sql("select who from tables").collect()(0).getString(0)
      assert(w == "mine", "user view 'tables' must survive the context round-trip")
    } finally {
      spark.catalog.dropTempView("databases")
      spark.catalog.dropTempView("tables")
      gs.sql("use default")
    }
  }

  test("EXPLAIN over a system table reproduces the group/mod.rs golden") {
    val got = gs.sql("explain select count(*) from incresql.databases")
      .collect().map(r => (0 until 4).map(r.getString).mkString("|")).toSeq
    assert(got == Seq(
      "GROUP|||",
      " |output_exprs:|||",
      " |  _col1|0|BIGINT|count()",
      " |source:|||",
      " |  TABLE(databases)|||",
      " |   |columns:|||",
      " |   |  name|0|TEXT|"))
  }
}
