package graft.queries

import graft.{Engine, QueryDef}
import graft.ivm.IncrementalAggView
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** End-to-end incremental-view scenario, oracle-verified.
  *
  * Scenario (deterministic so DuckDB can recompute it from scratch):
  *   1. materialize orders-by-status (count, sum(totalprice));
  *   2. delta 1: retract every 'F' order with o_orderkey % 10 = 0;
  *   3. delta 2: insert copies of every 'O' order with o_orderkey % 7 = 0
  *      at double price.
  * The view is maintained incrementally (two applyDelta merges over
  * partial-aggregate state); the oracle recomputes the same multiset
  * from scratch with freq arithmetic. Hash-match ⟺ retraction and
  * merge semantics are exactly right.
  */
object Ivm {

  val refresh: QueryDef = QueryDef.sqlBacked(
    "ivm_refresh",
    """WITH changes AS (
      |  SELECT o_orderstatus, o_totalprice, 1 AS freq FROM orders
      |  UNION ALL
      |  SELECT o_orderstatus, o_totalprice, -1 AS freq FROM orders
      |  WHERE o_orderstatus = 'F' AND o_orderkey % 10 = 0
      |  UNION ALL
      |  SELECT o_orderstatus, o_totalprice * 2, 1 AS freq FROM orders
      |  WHERE o_orderstatus = 'O' AND o_orderkey % 7 = 0
      |)
      |SELECT o_orderstatus, CAST(sum(freq) AS BIGINT) AS cnt,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)) * freq) AS DOUBLE) AS sum_o_totalprice,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)) * freq) AS DOUBLE) / sum(freq) AS avg_o_totalprice
      |FROM changes GROUP BY o_orderstatus HAVING sum(freq) <> 0
      |ORDER BY o_orderstatus""".stripMargin
  ) { (spark, dir) =>
    val orders = Engine.table(spark, dir, "orders")
    val statePath = java.nio.file.Files
      .createTempDirectory("graft_ivm_").toString
    val view = new IncrementalAggView(
      spark, Seq("o_orderstatus"), Seq("o_totalprice"), statePath)
    view.initialize(orders.select(col("o_orderstatus"), col("o_totalprice")))

    val retractions = orders
      .filter(col("o_orderstatus") === "F" && col("o_orderkey") % 10 === 0)
      .select(col("o_orderstatus"), col("o_totalprice"), lit(-1L).as(view.freqCol))
    view.applyDelta(retractions)

    val insertions = orders
      .filter(col("o_orderstatus") === "O" && col("o_orderkey") % 7 === 0)
      .select(col("o_orderstatus"), (col("o_totalprice") * 2).as("o_totalprice"),
        lit(1L).as(view.freqCol))
    view.applyDelta(insertions)

    // Exact decimal state, DOUBLE on the wire (see Tpch.discPrice note).
    view.current()
      .withColumn("sum_o_totalprice", col("sum_o_totalprice").cast(DoubleType))
      .orderBy(col("o_orderstatus"))
  }

  /** Retractable MIN/MAX view over the same deterministic change
    * scenario as [[refresh]] — the aggregate family the reference could
    * not retract (scalar partials can't uncover the next minimum); here
    * the state is the (key, value) freq-multiset, so retraction of an
    * extreme value exposes the next one. The oracle recomputes the
    * surviving multiset from scratch and takes min/max over freq > 0. */
  val extrema: QueryDef = QueryDef.sqlBacked(
    "ivm_extrema",
    """WITH changes AS (
      |  SELECT o_orderstatus, o_totalprice, 1 AS freq FROM orders
      |  UNION ALL
      |  SELECT o_orderstatus, o_totalprice, -1 AS freq FROM orders
      |  WHERE o_orderstatus = 'F' AND o_orderkey % 10 = 0
      |  UNION ALL
      |  SELECT o_orderstatus, o_totalprice * 2, 1 AS freq FROM orders
      |  WHERE o_orderstatus = 'O' AND o_orderkey % 7 = 0
      |),
      |ms AS (
      |  SELECT o_orderstatus, o_totalprice, sum(freq) AS f
      |  FROM changes GROUP BY o_orderstatus, o_totalprice
      |)
      |SELECT o_orderstatus,
      |  min(CASE WHEN f > 0 THEN o_totalprice END) AS min_o_totalprice,
      |  max(CASE WHEN f > 0 THEN o_totalprice END) AS max_o_totalprice
      |FROM ms GROUP BY o_orderstatus
      |HAVING sum(CASE WHEN f > 0 THEN 1 ELSE 0 END) > 0
      |ORDER BY o_orderstatus""".stripMargin
  ) { (spark, dir) =>
    val orders = Engine.table(spark, dir, "orders")
    val statePath = java.nio.file.Files
      .createTempDirectory("graft_ivm_ext_").resolve("state").toString
    val view = new graft.ivm.IncrementalExtremaView(
      spark, Seq("o_orderstatus"), "o_totalprice", statePath)
    view.initialize(orders.select(col("o_orderstatus"), col("o_totalprice")))

    view.applyDelta(orders
      .filter(col("o_orderstatus") === "F" && col("o_orderkey") % 10 === 0)
      .select(col("o_orderstatus"), col("o_totalprice"), lit(-1L).as(view.freqCol)))

    view.applyDelta(orders
      .filter(col("o_orderstatus") === "O" && col("o_orderkey") % 7 === 0)
      .select(col("o_orderstatus"), (col("o_totalprice") * 2).as("o_totalprice"),
        lit(1L).as(view.freqCol)))

    view.current().orderBy(col("o_orderstatus"))
  }

  /** Retractable COUNT(DISTINCT) view over the same change scenario —
    * served from the same multiset state as [[extrema]] (a distinct
    * value counts while its merged freq is positive; retraction to zero
    * removes it). The oracle recomputes the surviving multiset from
    * scratch and counts distinct values with freq > 0. */
  val distinct: QueryDef = QueryDef.sqlBacked(
    "ivm_distinct",
    """WITH changes AS (
      |  SELECT o_orderstatus, o_totalprice, 1 AS freq FROM orders
      |  UNION ALL
      |  SELECT o_orderstatus, o_totalprice, -1 AS freq FROM orders
      |  WHERE o_orderstatus = 'F' AND o_orderkey % 10 = 0
      |  UNION ALL
      |  SELECT o_orderstatus, o_totalprice * 2, 1 AS freq FROM orders
      |  WHERE o_orderstatus = 'O' AND o_orderkey % 7 = 0
      |),
      |ms AS (
      |  SELECT o_orderstatus, o_totalprice, sum(freq) AS f
      |  FROM changes GROUP BY o_orderstatus, o_totalprice
      |)
      |SELECT o_orderstatus,
      |  CAST(count(CASE WHEN f > 0 THEN 1 END) AS BIGINT) AS n_distinct_o_totalprice
      |FROM ms GROUP BY o_orderstatus
      |HAVING count(CASE WHEN f > 0 THEN 1 END) > 0
      |ORDER BY o_orderstatus""".stripMargin
  ) { (spark, dir) =>
    val orders = Engine.table(spark, dir, "orders")
    val statePath = java.nio.file.Files
      .createTempDirectory("graft_ivm_dist_").resolve("state").toString
    val view = new graft.ivm.IncrementalExtremaView(
      spark, Seq("o_orderstatus"), "o_totalprice", statePath)
    view.initialize(orders.select(col("o_orderstatus"), col("o_totalprice")))

    view.applyDelta(orders
      .filter(col("o_orderstatus") === "F" && col("o_orderkey") % 10 === 0)
      .select(col("o_orderstatus"), col("o_totalprice"), lit(-1L).as(view.freqCol)))

    view.applyDelta(orders
      .filter(col("o_orderstatus") === "O" && col("o_orderkey") % 7 === 0)
      .select(col("o_orderstatus"), (col("o_totalprice") * 2).as("o_totalprice"),
        lit(1L).as(view.freqCol)))

    view.distinctCounts().orderBy(col("o_orderstatus"))
  }

  val all: Seq[QueryDef] = Seq(refresh, extrema, distinct)
}
