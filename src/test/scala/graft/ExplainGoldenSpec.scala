package graft

import graft.sql.GraftSession
import org.scalatest.funsuite.AnyFunSuite

/** Golden tests for reference-format EXPLAIN, expected output lifted from
  * the reference's own test suite:
  *   - tests/optimize/constant_folding.rs (PROJECT/SINGLE, folded consts)
  *   - tests/group/mod.rs:4-43 (GROUP over TABLE with column list)
  *   - tests/building_blocks/unions.rs:40-65 (UNION_ALL tree, <OFFSET n>)
  *
  * Documented divergences from the reference, pinned here on purpose:
  *   - decimal widening follows Spark's arithmetic rules: the constant
  *     `1.0 + 2.0*3.0 - 4.0` types as DECIMAL(7,2) (reference: 6,2);
  *   - Spark renders integral-typed folded constants without a decimal
  *     point and keeps decimal scale (`3.00`) identically.
  */
class ExplainGoldenSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private lazy val gs = new GraftSession(spark)

  /** Render the explain DataFrame the way the reference's test runner
    * does: pipe-joined cells, one row per line. */
  private def show(sql: String): Seq[String] =
    gs.sql(sql).collect().toIndexedSeq
      .map(r => (0 until 4).map(r.getString).mkString("|"))

  test("EXPLAIN folds constants: PROJECT over SINGLE (constant_folding.rs)") {
    assert(show("EXPLAIN SELECT 1 + 2 * 3 - 4") == Seq(
      "PROJECT|||",
      " |output_exprs:|||",
      " |  _col1|0|INTEGER|3",
      " |source:|||",
      " |  SINGLE|||"))
  }

  test("EXPLAIN decimal constant keeps scale; precision is Spark's widening") {
    // reference golden says DECIMAL(6,2) — Spark's add/subtract widening
    // yields DECIMAL(7,2); value rendering (`3.00`) matches exactly.
    assert(show("EXPLAIN SELECT 1.0 + 2.0 * 3.0 - 4.0") == Seq(
      "PROJECT|||",
      " |output_exprs:|||",
      " |  _col1|0|DECIMAL(7,2)|3.00",
      " |source:|||",
      " |  SINGLE|||"))
  }

  test("EXPLAIN count(*) over a table: GROUP/TABLE with column list (group/mod.rs)") {
    // one-column parquet table standing in for incresql.databases
    val dir = java.nio.file.Files.createTempDirectory("graft_explain_").toString
    import spark.implicits._
    Seq("default", "graft").toDF("name").write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir).createOrReplaceTempView("databases")
    assert(show("EXPLAIN SELECT count(*) FROM databases") == Seq(
      "GROUP|||",
      " |output_exprs:|||",
      " |  _col1|0|BIGINT|count()",
      " |source:|||",
      " |  TABLE(databases)|||",
      " |   |columns:|||",
      " |   |  name|0|TEXT|"))
  }

  test("EXPLAIN union: UNION_ALL tree with <OFFSET n> references (unions.rs)") {
    assert(show("EXPLAIN SELECT c1 FROM (SELECT 1 as c1 UNION ALL SELECT 2)") == Seq(
      "PROJECT|||",
      " |output_exprs:|||",
      " |  c1|0|INTEGER|<OFFSET 0>",
      " |source:|||",
      " |  UNION_ALL|||",
      " |   |source_0:|||",
      " |   |  PROJECT|||",
      " |   |   |output_exprs:|||",
      " |   |   |  c1|0|INTEGER|1",
      " |   |   |source:|||",
      " |   |   |  SINGLE|||",
      " |   |source_1:|||",
      " |   |  PROJECT|||",
      " |   |   |output_exprs:|||",
      " |   |   |  _col1|0|INTEGER|2",
      " |   |   |source:|||",
      " |   |   |  SINGLE|||"))
  }

  test("EXPLAIN filter/sort/limit sections render predicate, sort_exprs, limit/offset") {
    val dir = java.nio.file.Files.createTempDirectory("graft_explain2_").toString
    import spark.implicits._
    Seq((1, "a"), (2, "b")).toDF("id", "s").write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir).createOrReplaceTempView("exp_t")
    val got = show("EXPLAIN SELECT id FROM exp_t WHERE id > 1 ORDER BY id LIMIT 2, 3")
    assert(got.head == "LIMIT|||")
    assert(got.contains(" |limit: 3|||"))
    assert(got.contains(" |offset: 2|||"))
    assert(got.exists(_.contains("SORT")))
    assert(got.exists(_.contains("sort_exprs:")))
    assert(got.exists(_.endsWith("<OFFSET 0> (ASC)")))
    assert(got.exists(_.contains("FILTER")))
    assert(got.exists(_.contains("predicate:")))
    assert(got.exists(_.contains("TABLE(exp_t)")))
  }

  test("EXPLAIN FORMATTED still surfaces Spark's physical plan") {
    val rows = gs.sql("EXPLAIN FORMATTED SELECT 1 + 1").collect().map(_.getString(0))
    assert(rows.exists(_.contains("Project")), rows.mkString("\n"))
  }
}
