package graft.queries

import graft.{Engine, QueryDef}
import org.apache.spark.sql.SparkSession

/** Subquery, multi-dimensional grouping, and table-generating operators —
  * the analytic SQL surface a user coming off the reference engine expects
  * on top of SURVEY.md §2.1's core relational set.
  *
  * Subqueries are declared as plain SQL and decorrelated by Catalyst:
  * IN/EXISTS become LeftSemi/LeftAnti joins, scalar subqueries become
  * broadcast one-row joins — all broadcastable, no corpus-side shuffle, so
  * each plan survives the 100 TB scale-up. The reference has no subquery
  * planner (its parser rejects them — /root/reference/src/parser/src/
  * select.rs covers only FROM/JOIN/WHERE/GROUP/ORDER), so this whole
  * module is a Spark-native extension in the spirit of
  * resolve_tables.rs' view inlining: declarative SQL, optimizer-planned.
  *
  * Determinism: aggregates over doubles go through exact DECIMAL sums;
  * double expressions use identical IEEE operation trees in the Spark and
  * DuckDB texts, so hash compares are bit-stable (QueryDef contract).
  */
object Analytic {

  private def reg(spark: SparkSession, dir: String, tables: String*): Unit =
    tables.foreach(t => Engine.table(spark, dir, t).createOrReplaceTempView(t))

  // --- uncorrelated IN subquery → LeftSemi join ---------------------------
  private val inSql =
    """SELECT c_custkey, c_name FROM customer
      |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 380000)
      |ORDER BY c_custkey""".stripMargin

  val subqueryIn: QueryDef = QueryDef.sqlBacked("op_subquery_in", inSql) {
    (spark, dir) => reg(spark, dir, "customer", "orders"); spark.sql(inSql)
  }

  // --- NOT IN with a NULL-bearing list: 3VL kills every row ---------------
  // `x NOT IN (list containing NULL)` is never TRUE (it is FALSE on a match,
  // NULL otherwise), so the with_null variant returns count 0 while the
  // no_null variant keeps suppliers outside the key range — the classic
  // ANSI trap, pinned as a two-row result on both engines.
  private val notInSql =
    """SELECT 'no_null' AS variant, count(*) AS n FROM supplier
      |WHERE s_nationkey NOT IN
      |  (SELECT n_nationkey FROM nation WHERE n_nationkey BETWEEN 5 AND 20)
      |UNION ALL
      |SELECT 'with_null' AS variant, count(*) AS n FROM supplier
      |WHERE s_nationkey NOT IN
      |  (SELECT nullif(n_nationkey, 7) FROM nation WHERE n_nationkey BETWEEN 5 AND 20)
      |ORDER BY variant""".stripMargin

  val subqueryNotIn: QueryDef = QueryDef.sqlBacked("op_subquery_notin", notInSql) {
    (spark, dir) => reg(spark, dir, "supplier", "nation"); spark.sql(notInSql)
  }

  // --- correlated EXISTS / NOT EXISTS → LeftSemi + LeftAnti ---------------
  private val existsSql =
    """SELECT c_custkey, c_mktsegment FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 350000)
      |  AND NOT EXISTS (SELECT 1 FROM orders o2
      |                  WHERE o2.o_custkey = c.c_custkey
      |                    AND o2.o_orderstatus = 'F' AND o2.o_totalprice > 350000)
      |ORDER BY c_custkey""".stripMargin

  val subqueryExists: QueryDef = QueryDef.sqlBacked("op_subquery_exists", existsSql) {
    (spark, dir) => reg(spark, dir, "customer", "orders"); spark.sql(existsSql)
  }

  // --- scalar subqueries in projection + predicate ------------------------
  // avg is spelled sum/count from an exact DECIMAL sum so the division is
  // one double op with the same operands on both engines (a double-sum avg
  // would be partition-order-dependent). Catalyst plans the two scalar
  // subqueries as broadcast one-row joins — no per-row recompute.
  private val scalarSql =
    """SELECT o_orderkey,
      |  CAST(o_totalprice AS DOUBLE) * (SELECT count(*) FROM orders)
      |    / (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |       FROM orders) AS price_ratio
      |FROM orders
      |WHERE CAST(o_totalprice AS DOUBLE) * (SELECT count(*) FROM orders)
      |  > 1.5 * (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |           FROM orders)
      |ORDER BY o_orderkey""".stripMargin

  val subqueryScalar: QueryDef = QueryDef.sqlBacked("op_subquery_scalar", scalarSql) {
    (spark, dir) => reg(spark, dir, "orders"); spark.sql(scalarSql)
  }

  // --- GROUPING SETS with grouping() disambiguation -----------------------
  // One shuffle: Spark expands the sets map-side (Expand) then aggregates
  // once on (keys, grouping_id) — the right shape at scale, no per-set scan.
  private val groupingSetsSql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(grouping(l_returnflag) AS INT) AS g_rf,
      |  CAST(grouping(l_linestatus) AS INT) AS g_ls,
      |  count(*) AS cnt,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag),
      |                        (l_linestatus), ())
      |ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  val groupingSets: QueryDef = QueryDef.sqlBacked("op_grouping_sets", groupingSetsSql) {
    (spark, dir) => reg(spark, dir, "lineitem"); spark.sql(groupingSetsSql)
  }

  // --- CUBE over two order dimensions -------------------------------------
  private val cubeSql =
    """SELECT o_orderstatus, o_orderpriority,
      |  CAST(grouping(o_orderstatus) AS INT) AS g_st,
      |  CAST(grouping(o_orderpriority) AS INT) AS g_pr,
      |  count(*) AS cnt,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM orders
      |GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY g_st, g_pr, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin

  val cube: QueryDef = QueryDef.sqlBacked("op_cube", cubeSql) {
    (spark, dir) => reg(spark, dir, "orders"); spark.sql(cubeSql)
  }

  // --- UNNEST with ordinality: posexplode ≡ unnest+generate_subscripts ----
  // Generate runs inside the scan's codegen stage — a per-row flatMap, no
  // shuffle; the only exchange is the final presentation sort.
  private val unnestSpark =
    """SELECT doc_id, CAST(pos + 1 AS INT) AS pos, tok
      |FROM (SELECT doc_id, word_ngrams(text, 1) AS toks
      |      FROM documents)
      |LATERAL VIEW posexplode(toks) t AS pos, tok
      |ORDER BY doc_id, pos""".stripMargin

  private val unnestOracle =
    """SELECT doc_id, CAST(pos AS INT) AS pos, tok FROM (
      |  SELECT doc_id,
      |    generate_subscripts(toks, 1) AS pos, unnest(toks) AS tok
      |  FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      |        FROM documents))
      |ORDER BY doc_id, pos""".stripMargin

  val unnest: QueryDef = QueryDef.sqlBacked("op_unnest", unnestOracle) {
    (spark, dir) => reg(spark, dir, "documents"); spark.sql(unnestSpark)
  }

  // --- LATERAL correlated derived table: top-2 orders per customer --------
  // The declarative form of per-group top-k. Catalyst decorrelates the
  // LIMIT'd lateral subquery into row_number + WindowGroupLimit (partial
  // top-k before the exchange) joined back broadcast — the same plan the
  // hand-written window idiom gets, proven by AnalyticSpec. At 100 TB the
  // WindowGroupLimit is the load-bearing piece: each map task keeps only
  // k rows per key, so the shuffle carries O(k·keys), not the fact table.
  private val lateralSql =
    """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
      |FROM customer c, LATERAL (
      |  SELECT o_orderkey, o_totalprice FROM orders
      |  WHERE o_custkey = c.c_custkey
      |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
      |WHERE c.c_custkey < 200
      |ORDER BY c.c_custkey, o.o_totalprice DESC, o.o_orderkey""".stripMargin

  val lateralJoin: QueryDef = QueryDef.sqlBacked("op_lateral_join", lateralSql) {
    (spark, dir) => reg(spark, dir, "customer", "orders"); spark.sql(lateralSql)
  }

  // --- QUALIFY clause (dialect extension) ---------------------------------
  // The filter-on-window-functions clause DuckDB/Snowflake define; Spark
  // lacks it, so GraftSession.rewriteQualify realizes it as a select-list
  // predicate filtered one level out (see the rewrite's doc). The ORACLE
  // IS THE IDENTICAL TEXT — DuckDB executes QUALIFY natively, so the
  // hash match proves the rewrite implements the clause's semantics, not
  // a paraphrase of them. Same plan as the window top-k idiom: rn <= k
  // predicates trigger WindowGroupLimit partial top-k before the exchange.
  private val qualifySql =
    """SELECT o_custkey, o_orderkey, o_totalprice FROM orders
      |QUALIFY row_number() OVER
      |  (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) <= 2
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  val qualify: QueryDef = QueryDef.sqlBacked("op_qualify", qualifySql) {
    (spark, dir) =>
      reg(spark, dir, "orders")
      spark.sql(graft.sql.GraftSession.rewriteQualify(qualifySql))
  }

  // --- per-column profiling (the data-quality "describe" operator) --------
  // One scan computes every column's row/null/distinct counts in a single
  // aggregation; the per-column rows are then unpivoted with stack() — a
  // zero-cost projection of the 1-row aggregate. The multi-column exact
  // count(DISTINCT) forces Catalyst's Expand (rows × #cols before the
  // combine); at 100 TB swap in approx_count_distinct per column to keep
  // the pass at pure map-side-combine cost — the query shape (agg →
  // stack) is unchanged, which is why it is written this way. The oracle
  // states the same numbers as one UNION ALL branch per column (DuckDB
  // may scan per branch; correctness only).
  private val profileCols = Seq("p_partkey", "p_name", "p_brand", "p_type",
    "p_size", "p_retailprice")

  private val profileSpark = {
    val aggs = profileCols.map(c =>
      s"count($c) AS nn_$c, count(DISTINCT $c) AS nd_$c").mkString(", ")
    val stacked = profileCols.map(c => s"'$c', nn_$c, nd_$c").mkString(", ")
    s"""SELECT column_name, n_rows, n_rows - n_nonnull AS n_nulls, n_distinct
       |FROM (
       |  SELECT n_rows, stack(${profileCols.size}, $stacked)
       |    AS (column_name, n_nonnull, n_distinct)
       |  FROM (SELECT count(*) AS n_rows, $aggs FROM part) agg) t
       |ORDER BY column_name""".stripMargin
  }

  private val profileOracle = profileCols.map(c =>
    s"""SELECT '$c' AS column_name, count(*) AS n_rows,
       |  count(*) - count($c) AS n_nulls, count(DISTINCT $c) AS n_distinct
       |FROM part""".stripMargin).mkString("", "\nUNION ALL\n", "\nORDER BY column_name")

  val profile: QueryDef = QueryDef.sqlBacked("op_profile", profileOracle) {
    (spark, dir) => reg(spark, dir, "part"); spark.sql(profileSpark)
  }

  val all: Seq[QueryDef] =
    Seq(subqueryIn, subqueryNotIn, subqueryExists, subqueryScalar,
      groupingSets, cube, unnest, lateralJoin, qualify, profile)
}
