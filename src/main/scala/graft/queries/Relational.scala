package graft.queries

import graft.{Engine, QueryDef}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's relational operator inventory (SURVEY.md §2.1), one
  * verifiable query per operator, re-expressed as Spark built-ins:
  *
  *   Single → OneRowRelation          (single.rs:4-45)
  *   Values → LocalRelation           (values.rs:4-36)
  *   TableScan → parquet scan         (table_scan.rs:12-44)
  *   Project/Filter → select/filter   (project.rs, filter.rs)
  *   Limit (offset+limit)             (limit.rs:6-63)
  *   Sort (multi-key, NULLS FIRST)    (sort.rs:12-207)
  *   HashJoin inner/left + residual   (hash_join.rs:17-182)
  *   Cross join                       (parser/src/select.rs:117-140)
  *   HashGroup / SortedGroup          (hash_group.rs, sorted_group.rs)
  *   UnionAll                         (union_all.rs:6-50)
  *   NegateFreq (DELETE)              (negate_freq.rs:6-32, delete.rs:56-60)
  *   TableInsert (multiset append)    (table_insert.rs:22-55)
  *   FileScan (CSV dir → JSON col)    (file_scan.rs:15-52)
  *   TableAlias / views               (logical.rs:88-93, resolve_tables.rs:35-58)
  *
  * File:line cites are into /root/reference/src/executor/src/point_in_time/
  * unless qualified. Every query pins a deterministic total order and
  * engine-portable output types (see QueryDef).
  */
object Relational {

  // --- Single: SELECT with no FROM → OneRowRelation -----------------------
  val single: QueryDef = QueryDef.sqlBacked(
    "op_single",
    "SELECT CAST(2 AS INT) AS two, CAST('x' AS VARCHAR) AS s, CAST(NULL AS INT) AS n"
  ) { (spark, _) =>
    spark.range(1).select(
      (lit(1) + lit(1)).cast(IntegerType).as("two"),
      lit("x").as("s"),
      lit(null).cast(IntegerType).as("n"))
  }

  // --- Values: inline literal rows → LocalRelation ------------------------
  val values: QueryDef = QueryDef.sqlBacked(
    "op_values",
    """SELECT id, name, CAST(amount AS VARCHAR) AS amount FROM (VALUES
      |  (CAST(1 AS BIGINT), CAST('a' AS VARCHAR), CAST(1.50 AS DECIMAL(10,2))),
      |  (CAST(2 AS BIGINT), CAST('b' AS VARCHAR), CAST(NULL AS DECIMAL(10,2))),
      |  (CAST(3 AS BIGINT), CAST(NULL AS VARCHAR), CAST(-7.25 AS DECIMAL(10,2)))
      |) AS t(id, name, amount)
      |ORDER BY id""".stripMargin
  ) { (spark, _) =>
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("amount", DecimalType(10, 2))))
    val rows = java.util.Arrays.asList(
      Row(1L, "a", new java.math.BigDecimal("1.50")),
      Row(2L, "b", null),
      Row(3L, null, new java.math.BigDecimal("-7.25")))
    // Decimal stringified for the compare — scale survives both engines'
    // rendering ("1.50"), unlike a raw DECIMAL column (see Tpch note).
    spark.createDataFrame(rows, schema)
      .select(col("id"), col("name"), col("amount").cast(StringType).as("amount"))
      .orderBy(col("id"))
  }

  // --- TableScan: full scan, pruned to selected columns -------------------
  val scan: QueryDef = QueryDef.sqlBacked(
    "op_scan",
    "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey"
  ) { (spark, dir) =>
    Engine.table(spark, dir, "region").orderBy(col("r_regionkey"))
  }

  // --- Project: scalar expressions per row --------------------------------
  val project: QueryDef = QueryDef.sqlBacked(
    "op_project",
    """SELECT n_nationkey, upper(n_name) AS uname,
      |  n_nationkey * 2 + 1 AS calc,
      |  CAST(n_regionkey AS BIGINT) AS rk
      |FROM nation ORDER BY n_nationkey""".stripMargin
  ) { (spark, dir) =>
    Engine.table(spark, dir, "nation").select(
      col("n_nationkey"),
      upper(col("n_name")).as("uname"),
      (col("n_nationkey") * 2 + 1).as("calc"),
      col("n_regionkey").cast(LongType).as("rk"))
      .orderBy(col("n_nationkey"))
  }

  // --- Filter: NULL predicate drops the row (filter.rs:8-42) --------------
  // nullif() synthesizes NULLs so the 3-valued drop path is exercised.
  val filter: QueryDef = QueryDef.sqlBacked(
    "op_filter",
    """SELECT s_suppkey, s_nationkey FROM supplier
      |WHERE nullif(s_nationkey, 3) > 5
      |ORDER BY s_suppkey""".stripMargin
  ) { (spark, dir) =>
    Engine.table(spark, dir, "supplier")
      .filter(nullif(col("s_nationkey"), lit(3)) > 5)
      .select(col("s_suppkey"), col("s_nationkey"))
      .orderBy(col("s_suppkey"))
  }

  // --- Limit + offset (limit.rs:27-45) ------------------------------------
  val limit: QueryDef = QueryDef.sqlBacked(
    "op_limit",
    "SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 7 OFFSET 5"
  ) { (spark, dir) =>
    Engine.table(spark, dir, "orders").select(col("o_orderkey"))
      .orderBy(col("o_orderkey")).offset(5).limit(7)
  }

  // --- Sort: multi-key asc/desc with NULLs --------------------------------
  // Reference: NULL sorts first on ASC and (total Ord) last on DESC
  // (datum.rs:132-190) — matches Spark's defaults; DuckDB needs it pinned.
  val sort: QueryDef = QueryDef.sqlBacked(
    "op_sort",
    """SELECT c_custkey, nullif(c_nationkey, 7) AS nk, c_mktsegment FROM customer
      |ORDER BY nk DESC NULLS LAST, c_mktsegment ASC, c_custkey ASC
      |LIMIT 50""".stripMargin
  ) { (spark, dir) =>
    Engine.table(spark, dir, "customer")
      .select(col("c_custkey"), nullif(col("c_nationkey"), lit(7)).as("nk"), col("c_mktsegment"))
      .orderBy(col("nk").desc_nulls_last, col("c_mktsegment").asc, col("c_custkey").asc)
      .limit(50)
  }

  // --- HashJoin inner (equi) ----------------------------------------------
  val joinInner: QueryDef = QueryDef.sqlBacked(
    "op_join_inner",
    """SELECT n_nationkey, n_name, r_name FROM nation JOIN region
      |ON n_regionkey = r_regionkey
      |ORDER BY n_nationkey""".stripMargin
  ) { (spark, dir) =>
    val n = Engine.table(spark, dir, "nation")
    val r = Engine.table(spark, dir, "region")
    n.join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"), col("r_name"))
      .orderBy(col("n_nationkey"))
  }

  // --- HashJoin left outer with null padding (hash_join.rs:147-160) -------
  // supplier covers few nations, so unmatched nations exercise the
  // null-padded right side.
  val joinLeft: QueryDef = QueryDef.sqlBacked(
    "op_join_left",
    """SELECT n_nationkey, n_name, s_suppkey, s_name
      |FROM nation LEFT JOIN supplier ON n_nationkey = s_nationkey
      |ORDER BY n_nationkey, s_suppkey NULLS FIRST""".stripMargin
  ) { (spark, dir) =>
    val n = Engine.table(spark, dir, "nation")
    val s = Engine.table(spark, dir, "supplier")
    n.join(s, col("n_nationkey") === col("s_nationkey"), "left_outer")
      .select(col("n_nationkey"), col("n_name"), col("s_suppkey"), col("s_name"))
      .orderBy(col("n_nationkey"), col("s_suppkey").asc_nulls_first)
  }

  // --- RIGHT / FULL OUTER (Spark-native extensions; the reference only
  // implements Inner and LeftOuter — hash_join.rs:17-182) ------------------
  val joinRight: QueryDef = QueryDef.sqlBacked(
    "op_join_right",
    """SELECT s_suppkey, s_name, n_nationkey, n_name
      |FROM supplier RIGHT JOIN nation ON s_nationkey = n_nationkey
      |ORDER BY n_nationkey, s_suppkey NULLS FIRST""".stripMargin
  ) { (spark, dir) =>
    Engine.table(spark, dir, "supplier")
      .join(Engine.table(spark, dir, "nation"),
        col("s_nationkey") === col("n_nationkey"), "right_outer")
      .select(col("s_suppkey"), col("s_name"), col("n_nationkey"), col("n_name"))
      .orderBy(col("n_nationkey"), col("s_suppkey").asc_nulls_first)
  }

  val joinFull: QueryDef = QueryDef.sqlBacked(
    "op_join_full",
    """SELECT a.k AS lk, b.k AS rk
      |FROM (SELECT c_custkey AS k FROM customer WHERE c_custkey <= 20) a
      |FULL JOIN (SELECT c_custkey + 10 AS k FROM customer WHERE c_custkey <= 20) b
      |  ON a.k = b.k
      |ORDER BY lk NULLS FIRST, rk NULLS FIRST""".stripMargin
  ) { (spark, dir) =>
    val c = Engine.table(spark, dir, "customer").filter(col("c_custkey") <= 20)
    val a = c.select(col("c_custkey").as("k")).alias("a")
    val b = c.select((col("c_custkey") + 10).as("k")).alias("b")
    a.join(b, col("a.k") === col("b.k"), "full_outer")
      .select(col("a.k").as("lk"), col("b.k").as("rk"))
      .orderBy(col("lk").asc_nulls_first, col("rk").asc_nulls_first)
  }

  // --- LEFT SEMI / LEFT ANTI (the plan shapes behind the reference's
  // DELETE rewrite — delete.rs:56-60 — surfaced as first-class joins) ------
  val joinSemi: QueryDef = QueryDef.sqlBacked(
    "op_join_semi",
    """SELECT c_custkey FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin
  ) { (spark, dir) =>
    Engine.table(spark, dir, "customer")
      .join(Engine.table(spark, dir, "orders"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"))
      .orderBy(col("c_custkey"))
  }

  /** Non-empty anti join: the probe side is an orders SLICE (every 4th
    * orderkey), so customers whose orders all fall outside the slice
    * survive — the non-empty path of the anti-join hash probe (115 rows
    * at sf0.01). The full-orders spelling, where EVERY customer has an
    * order and emptiness is the proof of referential coverage, lives on
    * as the `_empty` twin (VERDICT r12 #7). */
  val joinAnti: QueryDef = QueryDef.sqlBacked(
    "op_join_anti",
    """SELECT c_custkey FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_orderkey % 4 = 0)
      |ORDER BY c_custkey""".stripMargin
  ) { (spark, dir) =>
    Engine.table(spark, dir, "customer")
      .join(Engine.table(spark, dir, "orders").filter(col("o_orderkey") % 4 === 0),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"))
      .orderBy(col("c_custkey"))
  }

  /** DOCUMENTED EMPTINESS CONTRACT: against the full orders table the
    * anti join returns nothing — the driver data's every customer has at
    * least one order, and both engines agreeing on the empty result IS
    * the check (NULL-safe anti semantics + full probe coverage). */
  val joinAntiEmpty: QueryDef = QueryDef.sqlBackedEmptyOk(
    "op_join_anti_empty",
    """SELECT c_custkey FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin
  ) { (spark, dir) =>
    Engine.table(spark, dir, "customer")
      .join(Engine.table(spark, dir, "orders"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"))
      .orderBy(col("c_custkey"))
  }

  // --- Join with residual non-equi condition (hash_join.rs:36-39) ---------
  val joinNonEqui: QueryDef = QueryDef.sqlBacked(
    "op_join_nonequi",
    """SELECT n_nationkey, s_suppkey
      |FROM nation JOIN supplier
      |ON n_nationkey = s_nationkey AND s_suppkey * 2 > n_regionkey
      |ORDER BY n_nationkey, s_suppkey""".stripMargin
  ) { (spark, dir) =>
    val n = Engine.table(spark, dir, "nation")
    val s = Engine.table(spark, dir, "supplier")
    n.join(s, col("n_nationkey") === col("s_nationkey") &&
        col("s_suppkey") * 2 > col("n_regionkey"))
      .select(col("n_nationkey"), col("s_suppkey"))
      .orderBy(col("n_nationkey"), col("s_suppkey"))
  }

  // --- NULL join keys never match (hash_join.rs:98-102) -------------------
  val joinNullKeys: QueryDef = QueryDef.sqlBacked(
    "op_join_null_keys",
    """SELECT a.s_suppkey AS lk, b.s_suppkey AS rk
      |FROM (SELECT s_suppkey, nullif(s_nationkey, 3) AS jk FROM supplier) a
      |JOIN (SELECT s_suppkey, nullif(s_nationkey, 3) AS jk FROM supplier) b
      |ON a.jk = b.jk
      |ORDER BY lk, rk""".stripMargin
  ) { (spark, dir) =>
    val s = Engine.table(spark, dir, "supplier")
      .select(col("s_suppkey"), nullif(col("s_nationkey"), lit(3)).as("jk"))
    val a = s.alias("a")
    val b = s.alias("b")
    a.join(b, col("a.jk") === col("b.jk"))
      .select(col("a.s_suppkey").as("lk"), col("b.s_suppkey").as("rk"))
      .orderBy(col("lk"), col("rk"))
  }

  // --- Cross join ---------------------------------------------------------
  val joinCross: QueryDef = QueryDef.sqlBacked(
    "op_join_cross",
    """SELECT r_regionkey, n_nationkey FROM region, nation
      |ORDER BY r_regionkey, n_nationkey""".stripMargin
  ) { (spark, dir) =>
    Engine.table(spark, dir, "region")
      .crossJoin(Engine.table(spark, dir, "nation"))
      .select(col("r_regionkey"), col("n_nationkey"))
      .orderBy(col("r_regionkey"), col("n_nationkey"))
  }

  // --- HashGroup: keyed aggregation with NULL-skipping count/sum ----------
  val groupHash: QueryDef = QueryDef.sqlBacked(
    "op_group_hash",
    """SELECT o_orderstatus,
      |  count(*) AS cnt_all,
      |  count(nullif(o_custkey, 5)) AS cnt_nonnull,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total,
      |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin
  ) { (spark, dir) =>
    Engine.table(spark, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("cnt_all"),
        count(nullif(col("o_custkey"), lit(5))).as("cnt_nonnull"),
        sum(col("o_totalprice").cast(DecimalType(12, 2))).cast(DoubleType).as("total"),
        min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key"))
      .orderBy(col("o_orderstatus"))
  }

  // --- SortedGroup: global aggregate over EMPTY input → exactly one row ---
  // (sorted_group.rs guarantees |0|NULL| on empty input; tests/group/mod.rs:20-26)
  val groupGlobalEmpty: QueryDef = QueryDef.sqlBacked(
    "op_group_global_empty",
    """SELECT count(*) AS cnt,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
      |FROM orders WHERE false""".stripMargin
  ) { (spark, dir) =>
    Engine.table(spark, dir, "orders")
      .filter(lit(false))
      .agg(
        count(lit(1)).as("cnt"),
        sum(col("o_totalprice").cast(DecimalType(12, 2))).cast(DoubleType).as("total"))
  }

  // --- Scalars over aggregates: sqrt(sum(a²)+sum(b²)) ----------------------
  // (aggregate_expression.rs:7-51 — 3-layer aggregate expression trees)
  val groupExpr: QueryDef = QueryDef.sqlBacked(
    "op_group_expr",
    """SELECT l_returnflag,
      |  sqrt(CAST(sum(CAST(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2)) AS DECIMAL(25,4))) AS DOUBLE)
      |     + CAST(sum(CAST(CAST(l_discount AS DECIMAL(4,2)) * CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(9,4))) AS DOUBLE)) AS norm,
      |  count(*) AS cnt
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  ) { (spark, dir) =>
    val q = col("l_quantity").cast(DecimalType(12, 2))
    val d = col("l_discount").cast(DecimalType(4, 2))
    Engine.table(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        sqrt(sum((q * q).cast(DecimalType(25, 4))).cast(DoubleType) +
          sum((d * d).cast(DecimalType(9, 4))).cast(DoubleType)).as("norm"),
        count(lit(1)).as("cnt"))
      .orderBy(col("l_returnflag"))
  }

  // --- ANY_VALUE-style loose grouping, made deterministic as min ----------
  // (aggregate_expression.rs:28-33 — non-aggregate non-key exprs take the
  // first value; we pin determinism with min, the documented divergence)
  val groupAnyValue: QueryDef = QueryDef.sqlBacked(
    "op_group_anyvalue",
    """SELECT c_nationkey, min(c_name) AS a_name, count(*) AS cnt
      |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin
  ) { (spark, dir) =>
    Engine.table(spark, dir, "customer")
      .groupBy(col("c_nationkey"))
      .agg(min(col("c_name")).as("a_name"), count(lit(1)).as("cnt"))
      .orderBy(col("c_nationkey"))
  }

  // --- UnionAll: bag semantics, no dedup (union_all.rs:6-50) --------------
  val unionAll: QueryDef = QueryDef.sqlBacked(
    "op_union_all",
    """SELECT k, v FROM (
      |  SELECT r_regionkey AS k, r_name AS v FROM region
      |  UNION ALL
      |  SELECT r_regionkey AS k, r_name AS v FROM region
      |  UNION ALL
      |  SELECT n_nationkey AS k, n_name AS v FROM nation
      |) u ORDER BY k, v""".stripMargin
  ) { (spark, dir) =>
    val r = Engine.table(spark, dir, "region")
      .select(col("r_regionkey").as("k"), col("r_name").as("v"))
    val n = Engine.table(spark, dir, "nation")
      .select(col("n_nationkey").as("k"), col("n_name").as("v"))
    r.unionAll(r).unionAll(n).orderBy(col("k"), col("v"))
  }

  // --- DELETE = NegateFreq(Filter(Scan)) → anti-join rewrite --------------
  // (delete.rs:56-60; negate_freq.rs:6-32). Batch-parquet semantics: the
  // surviving multiset is everything not matching the delete predicate.
  val delete: QueryDef = QueryDef.sqlBacked(
    "op_delete",
    """SELECT o_orderkey, o_orderstatus FROM orders
      |WHERE o_orderkey NOT IN (
      |  SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')
      |ORDER BY o_orderkey""".stripMargin
  ) { (spark, dir) =>
    val o = Engine.table(spark, dir, "orders")
    val toDelete = o.filter(col("o_orderstatus") === "F").select(col("o_orderkey"))
    o.join(toDelete.withColumnRenamed("o_orderkey", "d_key"),
        col("o_orderkey") === col("d_key"), "left_anti")
      .select(col("o_orderkey"), col("o_orderstatus"))
      .orderBy(col("o_orderkey"))
  }

  // --- UPDATE statement (Spark-native DML extension) ----------------------
  // The reference's DML surface stops at INSERT/DELETE; UPDATE completes
  // it via GraftSession's whole-table rewrite (CASE projection staged
  // through a temp path — see GraftSession.update). This runs the REAL
  // statement against a scratch managed table seeded from region; the
  // oracle states the per-row CASE semantics directly, including the
  // ANSI rule that a NULL predicate leaves the row unchanged.
  val update: QueryDef = QueryDef.sqlBacked(
    "op_update",
    """SELECT r_regionkey,
      |  CASE WHEN r_regionkey < 2 THEN upper(r_name) ELSE r_name END AS r_name
      |FROM region ORDER BY r_regionkey""".stripMargin
  ) { (spark, dir) =>
    val tbl = s"graft_upd_${System.nanoTime()}"
    val gs = new graft.sql.GraftSession(spark)
    Engine.table(spark, dir, "region").write.saveAsTable(tbl)
    try {
      gs.sql(s"UPDATE $tbl SET r_name = upper(r_name) WHERE r_regionkey < 2")
      val updated = spark.table(tbl)
        .select(col("r_regionkey"), col("r_name")).orderBy(col("r_regionkey"))
      // pin the (tiny) result before dropping the managed table under it
      spark.createDataFrame(
        java.util.Arrays.asList(updated.collect(): _*), updated.schema)
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  // --- MERGE statement (upsert; Spark-native DML extension) ---------------
  // Runs the REAL statement via GraftSession's join-based rewrite against
  // a scratch table seeded from region: matched keys (< 2) update,
  // the unmatched source row (99) inserts. The oracle states the upsert
  // semantics as CASE + UNION ALL.
  val merge: QueryDef = QueryDef.sqlBacked(
    "op_merge",
    """SELECT r_regionkey, r_name FROM (
      |  SELECT r_regionkey,
      |    CASE WHEN r_regionkey < 2 THEN upper(r_name) ELSE r_name END AS r_name
      |  FROM region
      |  UNION ALL SELECT 99, 'NEWREGION') t
      |ORDER BY r_regionkey""".stripMargin
  ) { (spark, dir) =>
    val tbl = s"graft_mrg_${System.nanoTime()}"
    val gs = new graft.sql.GraftSession(spark)
    Engine.table(spark, dir, "region").write.saveAsTable(tbl)
    try {
      gs.sql(
        s"""MERGE INTO $tbl USING (
           |  SELECT r_regionkey AS k, upper(r_name) AS nm FROM $tbl WHERE r_regionkey < 2
           |  UNION ALL SELECT 99, 'NEWREGION') src
           |ON $tbl.r_regionkey = src.k
           |WHEN MATCHED THEN UPDATE SET r_name = src.nm
           |WHEN NOT MATCHED THEN INSERT (r_regionkey, r_name) VALUES (src.k, src.nm)""".stripMargin)
      val merged = spark.table(tbl)
        .select(col("r_regionkey"), col("r_name")).orderBy(col("r_regionkey"))
      spark.createDataFrame(
        java.util.Arrays.asList(merged.collect(): _*), merged.schema)
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  // --- TableInsert: multiset append — duplicate inserts survive -----------
  // (table_insert.rs:22-55; a user table is a bag). Writes region twice to
  // a scratch parquet table, reads it back, counts per key.
  val insert: QueryDef = QueryDef.sqlBacked(
    "op_insert",
    """SELECT r_regionkey, r_name, count(*) AS copies FROM (
      |  SELECT * FROM region UNION ALL SELECT * FROM region
      |) t GROUP BY r_regionkey, r_name ORDER BY r_regionkey""".stripMargin
  ) { (spark, dir) =>
    val target = java.nio.file.Files
      .createTempDirectory("graft_sink_").resolve("region_copy").toString
    val r = Engine.table(spark, dir, "region")
    r.write.mode("append").parquet(target)
    r.write.mode("append").parquet(target)
    spark.read.parquet(target)
      .groupBy(col("r_regionkey"), col("r_name"))
      .agg(count(lit(1)).as("copies"))
      .orderBy(col("r_regionkey"))
  }

  // --- Freq-compacting multiset write (storage/src/table.rs:309-347) ------
  // The write path merges __freq per identical tuple instead of
  // physically duplicating rows: two inserts of region then a NegateFreq
  // delete (freq −1) of regions 0-1 leaves a compacted snapshot whose
  // expansion is the surviving multiset. The oracle replays the same
  // algebra as bag operations: (region ⊎ region) ∖ region[key<2].
  val multisetFreq: QueryDef = QueryDef.sqlBacked(
    "op_multiset_freq",
    """SELECT r_regionkey, r_name, count(*) AS copies FROM (
      |  (SELECT * FROM region UNION ALL SELECT * FROM region)
      |  EXCEPT ALL
      |  (SELECT * FROM region WHERE r_regionkey < 2)
      |) t GROUP BY r_regionkey, r_name ORDER BY r_regionkey""".stripMargin
  ) { (spark, dir) =>
    val path = java.nio.file.Files
      .createTempDirectory("graft_multiset_").resolve("region_ms").toString
    val r = Engine.table(spark, dir, "region")
    graft.sources.MultisetStore.append(spark, path, r)           // INSERT ×1
    graft.sources.MultisetStore.append(spark, path, r)           // INSERT ×1 → freq 2
    graft.sources.MultisetStore.append(spark, path,              // DELETE one copy
      r.filter(col("r_regionkey") < 2), freq = -1L)
    graft.sources.MultisetStore.read(spark, path)
      .groupBy(col("r_regionkey"), col("r_name"))
      .agg(count(lit(1)).as("copies"))
      .orderBy(col("r_regionkey"))
  }

  // --- LSM delta appends + compaction (storage/src/table.rs:309-347) ------
  // Same multiset algebra as op_multiset_freq, but through the O(delta)
  // write path: each INSERT/DELETE persists only its delta (the
  // reference's LSM write shape), state is merged on read, and an
  // explicit compact folds the chain into one snapshot. The oracle — and
  // the equality with op_multiset_freq's algebra — proves delta-append ∘
  // compact ≡ eager merge: (region ⊎ region) ∖ region[key<2].
  val multisetCompact: QueryDef = QueryDef.sqlBacked(
    "op_multiset_compact",
    """SELECT r_regionkey, r_name, count(*) AS copies FROM (
      |  (SELECT * FROM region UNION ALL SELECT * FROM region)
      |  EXCEPT ALL
      |  (SELECT * FROM region WHERE r_regionkey < 2)
      |) t GROUP BY r_regionkey, r_name ORDER BY r_regionkey""".stripMargin
  ) { (spark, dir) =>
    val path = java.nio.file.Files
      .createTempDirectory("graft_multiset_").resolve("region_lsm").toString
    val r = Engine.table(spark, dir, "region")
    graft.sources.MultisetStore.appendDelta(spark, path, r)      // INSERT ×1
    graft.sources.MultisetStore.appendDelta(spark, path, r)      // INSERT ×1
    graft.sources.MultisetStore.appendDelta(spark, path,         // DELETE one copy
      r.filter(col("r_regionkey") < 2), freq = -1L)
    graft.sources.MultisetStore.compact(spark, path)
    graft.sources.MultisetStore.vacuum(path)
    graft.sources.MultisetStore.read(spark, path)
      .groupBy(col("r_regionkey"), col("r_name"))
      .agg(count(lit(1)).as("copies"))
      .orderBy(col("r_regionkey"))
  }

  // --- FileScan: recursive CSV directory → one JSON-array column ----------
  // (file_scan.rs:15-52 + FIXTURES.md §2 — the embedded quoted comma case)
  val fileScan: QueryDef = QueryDef.sqlBacked(
    "op_filescan_csv",
    """SELECT * FROM (VALUES
      |  ('["123","abc","12.1"]'), ('["456","d,ef","13.2"]')
      |) t(data) ORDER BY data""".stripMargin
  ) { (spark, _) =>
    val d = java.nio.file.Files.createTempDirectory("graft_csv_")
    val sub = java.nio.file.Files.createDirectory(d.resolve("nested"))
    java.nio.file.Files.writeString(sub.resolve("simple.csv"),
      "123,abc,12.1\n456,\"d,ef\",13.2\n")
    val raw = spark.read
      .option("recursiveFileLookup", "true")
      .option("delimiter", ",")
      .schema(StructType(Seq(
        StructField("_c0", StringType), StructField("_c1", StringType),
        StructField("_c2", StringType))))
      .csv(d.toString)
    raw.select(to_json(array(col("_c0"), col("_c1"), col("_c2"))).as("data"))
      .orderBy(col("data"))
  }

  // --- JSON sink + source roundtrip ---------------------------------------
  // The reference's only file format is CSV-in/JSON-column; Spark-native
  // coverage extends to JSON-lines as both sink and source. The oracle is
  // the equivalent direct query — hash equality proves roundtrip fidelity
  // (schema pinned on read; inference is nondeterministic under column
  // pruning and belongs nowhere near a correctness gate).
  val roundtripJson: QueryDef = QueryDef.sqlBacked(
    "op_roundtrip_json",
    """SELECT doc_id, lang, CAST(length(text) AS INT) AS n_chars FROM documents
      |ORDER BY doc_id""".stripMargin
  ) { (spark, dir) =>
    val out = java.nio.file.Files
      .createTempDirectory("graft_json_sink_").resolve("docs_json").toString
    Engine.table(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), length(col("text")).as("n_chars"))
      .write.mode("overwrite").json(out)
    spark.read
      .schema(StructType(Seq(
        StructField("doc_id", LongType), StructField("lang", StringType),
        StructField("n_chars", IntegerType))))
      .json(out)
      .orderBy(col("doc_id"))
  }

  // --- multiset change-data feed (CDC over the LSM version chain) ---------
  // History: v0 = region; v1 = +1 for keys<3; v2 = −2 for keys<2 (net
  // deletes). The feed between v0 and v2 surfaces inserts AND deletes as
  // signed freq deltas; the oracle states the net change per key
  // directly. Cost shape: one merge aggregation over two retained states
  // — no log replay, no per-version scan chain.
  val multisetChanges: QueryDef = QueryDef.sqlBacked(
    "op_multiset_changes",
    """SELECT r_regionkey, r_name,
      |  CAST(CASE WHEN r_regionkey < 2 THEN -1 ELSE 1 END AS BIGINT) AS __freq
      |FROM region WHERE r_regionkey < 3 ORDER BY r_regionkey""".stripMargin
  ) { (spark, dir) =>
    val path = java.nio.file.Files
      .createTempDirectory("graft_multiset_cdc_").resolve("region_ms").toString
    val r = Engine.table(spark, dir, "region")
    graft.sources.MultisetStore.append(spark, path, r)                        // v0
    graft.sources.MultisetStore.appendDelta(spark, path,
      r.filter(col("r_regionkey") < 3))                                       // v1
    graft.sources.MultisetStore.appendDelta(spark, path,
      r.filter(col("r_regionkey") < 2), freq = -2L)                           // v2
    graft.sources.MultisetStore.changes(spark, path, 0, 2)
      .orderBy(col("r_regionkey"))
  }

  // --- multiset storage through the SQL front door ------------------------
  // The reference's user-table DML semantics end to end over GraftSession:
  // CREATE MULTISET TABLE binds a name to the freq-merging LSM store;
  // INSERT appends +1 deltas (table_insert.rs:22-55), DELETE appends
  // negated frequencies (delete.rs:56-60), COMPACT TABLE folds the chain.
  // The oracle states the surviving multiset directly: (2,'b') is
  // inserted twice, fully deleted (both copies — DELETE negates the whole
  // frequency), then re-inserted once.
  private def freshGraftSession(spark: SparkSession): graft.sql.GraftSession =
    new graft.sql.GraftSession(spark,
      viewCatalogDir = java.nio.file.Files
        .createTempDirectory("graft_sql_views_").toString,
      multisetCatalogDir = java.nio.file.Files
        .createTempDirectory("graft_sql_ms_").toString)

  val multisetSql: QueryDef = QueryDef.sqlBacked(
    "op_multiset_sql",
    """SELECT id, name FROM (VALUES (1,'a'),(2,'b'),(3,'c'),(4,'d')) t(id, name)
      |ORDER BY id""".stripMargin
  ) { (spark, _) =>
    freshGraftSession(spark).script(
      """CREATE MULTISET TABLE ms_demo (id INTEGER, name TEXT);
        |INSERT INTO ms_demo VALUES (1, 'a'), (2, 'b'), (2, 'b'), (3, 'c');
        |INSERT INTO ms_demo SELECT 4, 'd';
        |DELETE FROM ms_demo WHERE id = 2;
        |INSERT INTO ms_demo VALUES (2, 'b');
        |COMPACT TABLE ms_demo;
        |SELECT id, name FROM ms_demo ORDER BY id""".stripMargin)
  }

  // Time travel over the retained version chain: v0 = CREATE (empty),
  // v1 = 4-row insert, v2 = +1 row, v3 = delete, v4 = re-insert,
  // v5 = compact. AS OF VERSION 2 reconstructs the pre-delete bag —
  // including BOTH copies of (2,'b'), which proves the read replays
  // frequencies, not just distinct tuples.
  val multisetAsOf: QueryDef = QueryDef.sqlBacked(
    "op_multiset_asof",
    """SELECT id, name FROM (VALUES (1,'a'),(2,'b'),(2,'b'),(3,'c'),(4,'d')) t(id, name)
      |ORDER BY id, name""".stripMargin
  ) { (spark, _) =>
    freshGraftSession(spark).script(
      """CREATE MULTISET TABLE ms_hist (id INTEGER, name TEXT);
        |INSERT INTO ms_hist VALUES (1, 'a'), (2, 'b'), (2, 'b'), (3, 'c');
        |INSERT INTO ms_hist SELECT 4, 'd';
        |DELETE FROM ms_hist WHERE id = 2;
        |COMPACT TABLE ms_hist;
        |SELECT id, name FROM ms_hist AS OF VERSION 2 ORDER BY id, name""".stripMargin)
  }

  // --- salted skew join (operators/SkewJoin — SCALE.md "Joins") -----------
  // The static hot-key answer when AQE's runtime skew split isn't enough:
  // probe rows spread across 8 salt sub-keys, build side replicated 8
  // ways, so one hot key occupies 8 tasks instead of one straggler. The
  // oracle is the plain inner join — salting must be invisible in the
  // result, which is exactly what the hash match proves.
  val skewJoin: QueryDef = QueryDef.sqlBacked(
    "op_skew_join",
    """SELECT l_orderkey, l_linenumber, s_name FROM lineitem
      |JOIN supplier ON l_suppkey = s_suppkey
      |WHERE l_orderkey < 300
      |ORDER BY l_orderkey, l_linenumber""".stripMargin
  ) { (spark, dir) =>
    val li = Engine.table(spark, dir, "lineitem").filter(col("l_orderkey") < 300)
    val supp = Engine.table(spark, dir, "supplier")
    graft.operators.SkewJoin
      .saltedInnerJoin(li, supp, "l_suppkey", "s_suppkey", salt = 8)
      .select(col("l_orderkey"), col("l_linenumber"), col("s_name"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  // --- ORC sink + source roundtrip (columnar format beyond parquet) -------
  // Same contract as op_roundtrip_json for Spark's other built-in columnar
  // format: write ORC, read it back (schema pinned), hash-match the
  // direct query. ORC carries its own min/max stripe stats, so the
  // pushdown story (PushedFilters at the scan) holds there too.
  val roundtripOrc: QueryDef = QueryDef.sqlBacked(
    "op_roundtrip_orc",
    """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      |WHERE o_orderkey < 500 ORDER BY o_orderkey""".stripMargin
  ) { (spark, dir) =>
    val out = java.nio.file.Files
      .createTempDirectory("graft_orc_sink_").resolve("orders_orc").toString
    Engine.table(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .write.mode("overwrite").orc(out)
    spark.read
      .schema(StructType(Seq(
        StructField("o_orderkey", LongType), StructField("o_orderstatus", StringType),
        StructField("o_totalprice", DoubleType))))
      .orc(out)
      .filter(col("o_orderkey") < 500)
      .orderBy(col("o_orderkey"))
  }

  // --- Views: registered, inlined at plan time (resolve_tables.rs:35-58) --
  val view: QueryDef = QueryDef.sqlBacked(
    "op_view",
    """SELECT v.nk, v.cnt, n_name FROM (
      |  SELECT c_nationkey AS nk, count(*) AS cnt FROM customer GROUP BY c_nationkey
      |) v JOIN nation ON v.nk = n_nationkey
      |ORDER BY v.nk""".stripMargin
  ) { (spark, dir) =>
    Engine.table(spark, dir, "customer")
      .groupBy(col("c_nationkey").as("nk"))
      .agg(count(lit(1)).as("cnt"))
      .createOrReplaceTempView("graft_cust_by_nation")
    Engine.table(spark, dir, "nation").createOrReplaceTempView("graft_nation_v")
    spark.sql(
      """SELECT v.nk, v.cnt, n_name FROM graft_cust_by_nation v
        |JOIN graft_nation_v ON v.nk = n_nationkey
        |ORDER BY v.nk""".stripMargin)
  }

  // --- INTERSECT / EXCEPT (Spark-native extensions; confirmed absent from
  // the reference parser — completes the set-operator family with
  // UNION ALL and DISTINCT). Set semantics (deduplicated) on both engines.
  val intersect: QueryDef = QueryDef.sqlBacked(
    "op_intersect",
    """SELECT c_nationkey AS nk FROM customer
      |INTERSECT
      |SELECT s_nationkey FROM supplier
      |ORDER BY nk""".stripMargin
  ) { (spark, dir) =>
    val c = Engine.table(spark, dir, "customer").select(col("c_nationkey").as("nk"))
    val s = Engine.table(spark, dir, "supplier").select(col("s_nationkey").as("nk"))
    c.intersect(s).orderBy(col("nk"))
  }

  /** Non-empty EXCEPT: the right operand restricts to s_nationkey < 20,
    * so the customer nationkeys ≥ 20 survive — the non-empty path of the
    * set-difference dedup+anti (5 rows at sf0.01; VERDICT r12 #7). The
    * full-operand spelling, where both sides cover the same nation range
    * and emptiness is the containment proof, is the `_empty` twin. */
  val except: QueryDef = QueryDef.sqlBacked(
    "op_except",
    """SELECT c_nationkey AS nk FROM customer
      |EXCEPT
      |SELECT s_nationkey FROM supplier WHERE s_nationkey < 20
      |ORDER BY nk""".stripMargin
  ) { (spark, dir) =>
    val c = Engine.table(spark, dir, "customer").select(col("c_nationkey").as("nk"))
    val s = Engine.table(spark, dir, "supplier")
      .filter(col("s_nationkey") < 20).select(col("s_nationkey").as("nk"))
    c.except(s).orderBy(col("nk"))
  }

  /** DOCUMENTED EMPTINESS CONTRACT: customer nationkeys are a subset of
    * supplier nationkeys in the driver data, so the full EXCEPT is empty
    * on both engines — set containment proven as agreement on nothing. */
  val exceptEmpty: QueryDef = QueryDef.sqlBackedEmptyOk(
    "op_except_empty",
    """SELECT c_nationkey AS nk FROM customer
      |EXCEPT
      |SELECT s_nationkey FROM supplier
      |ORDER BY nk""".stripMargin
  ) { (spark, dir) =>
    val c = Engine.table(spark, dir, "customer").select(col("c_nationkey").as("nk"))
    val s = Engine.table(spark, dir, "supplier").select(col("s_nationkey").as("nk"))
    c.except(s).orderBy(col("nk"))
  }

  // --- INTERSECT ALL / EXCEPT ALL: the bag variants -----------------------
  // The multiset-correct set ops (min/monus of multiplicities) — the
  // algebra the freq-annotated storage model lives on, surfaced as query
  // operators. Aggregated to (key, copies) so the multiplicity math is
  // the thing the hash match proves.
  val intersectAll: QueryDef = QueryDef.sqlBacked(
    "op_intersect_all",
    """SELECT nk, count(*) AS copies FROM (
      |  SELECT c_nationkey AS nk FROM customer
      |  INTERSECT ALL
      |  SELECT s_nationkey FROM supplier) t
      |GROUP BY nk ORDER BY nk""".stripMargin
  ) { (spark, dir) =>
    val c = Engine.table(spark, dir, "customer").select(col("c_nationkey").as("nk"))
    val s = Engine.table(spark, dir, "supplier").select(col("s_nationkey").as("nk"))
    c.intersectAll(s).groupBy(col("nk")).agg(count(lit(1)).as("copies"))
      .orderBy(col("nk"))
  }

  val exceptAll: QueryDef = QueryDef.sqlBacked(
    "op_except_all",
    """SELECT nk, count(*) AS copies FROM (
      |  SELECT c_nationkey AS nk FROM customer
      |  EXCEPT ALL
      |  SELECT s_nationkey FROM supplier) t
      |GROUP BY nk ORDER BY nk""".stripMargin
  ) { (spark, dir) =>
    val c = Engine.table(spark, dir, "customer").select(col("c_nationkey").as("nk"))
    val s = Engine.table(spark, dir, "supplier").select(col("s_nationkey").as("nk"))
    c.exceptAll(s).groupBy(col("nk")).agg(count(lit(1)).as("copies"))
      .orderBy(col("nk"))
  }

  // --- ROLLUP (Spark-native extension; absent from the reference parser) --
  // Subtotal hierarchy over (returnflag, linestatus) with grouping()
  // indicators pinned to INT on both engines (NULL-valued keys in
  // subtotal rows are real NULLs in both).
  val rollup: QueryDef = QueryDef.sqlBacked(
    "op_rollup",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(grouping(l_returnflag) AS INT) AS g_rf,
      |  CAST(grouping(l_linestatus) AS INT) AS g_ls,
      |  count(*) AS n
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin
  ) { (spark, dir) =>
    Engine.table(spark, dir, "lineitem").createOrReplaceTempView("lineitem")
    spark.sql(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(grouping(l_returnflag) AS INT) AS g_rf,
        |  CAST(grouping(l_linestatus) AS INT) AS g_ls,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)
  }

  // --- PIVOT (Spark-native extension) -------------------------------------
  // Orders-per-status pivoted to one column per status value. The Spark
  // side uses the DataFrame pivot API (values pinned — at scale an
  // unpinned pivot triggers an extra distinct-values job); the oracle
  // states the equivalent conditional aggregation.
  val pivot: QueryDef = QueryDef.sqlBacked(
    "op_pivot",
    """SELECT o_orderpriority,
      |  CAST(count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS F,
      |  CAST(count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS O,
      |  CAST(count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT) AS P
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin
  ) { (spark, dir) =>
    Engine.table(spark, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .count()
      .na.fill(0L, Seq("F", "O", "P"))
      .orderBy(col("o_orderpriority"))
  }

  // --- Distinct (Spark-native extension; reference parser never emits it) -
  val distinct: QueryDef = QueryDef.sqlBacked(
    "op_distinct",
    "SELECT DISTINCT o_orderstatus FROM orders ORDER BY o_orderstatus"
  ) { (spark, dir) =>
    Engine.table(spark, dir, "orders").select(col("o_orderstatus"))
      .distinct().orderBy(col("o_orderstatus"))
  }

  val all: Seq[QueryDef] = Seq(
    single, values, scan, project, filter, limit, sort,
    joinInner, joinLeft, joinRight, joinFull, joinSemi, joinAnti, joinAntiEmpty,
    joinNonEqui, joinNullKeys, joinCross, skewJoin,
    groupHash, groupGlobalEmpty, groupExpr, groupAnyValue,
    unionAll, delete, update, merge, insert, multisetFreq, multisetCompact,
    multisetChanges, multisetSql, multisetAsOf, fileScan,
    roundtripJson, roundtripOrc, view, distinct,
    rollup, pivot, intersect, except, exceptEmpty, intersectAll, exceptAll)
}
