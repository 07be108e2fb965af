package graft.queries

import graft.{Engine, QueryDef}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar + aggregate function inventory (SURVEY.md §2.2/2.3), mapped to
  * Spark built-ins (reference impls under
  * /root/reference/src/functions/src/scalar/ and aggregate/).
  *
  * Engine-portability rules baked into the oracles (verified against
  * DuckDB 1.0): `/` on ints is double division in both; x/0 → NULL in
  * both; `%` matches; double→int CAST diverges (DuckDB rounds, Spark
  * truncates) so it is never used; `year()` is BIGINT in DuckDB → pinned
  * to INT; DuckDB `concat` skips NULLs → oracles use `||`.
  */
object Functions {

  // --- comparisons + BETWEEN + IS NULL over a NULL-bearing projection -----
  // (scalar/bool/{eq,ne,gt,gte,lt,lte}.rs, between.rs:8-39, is_null.rs)
  val compare: QueryDef = QueryDef.sqlBacked(
    "fn_compare",
    """SELECT s_suppkey,
      |  nk = 5 AS eq5, nk <> 5 AS ne5, nk > 5 AS gt5, nk >= 5 AS ge5,
      |  nk < 5 AS lt5, nk <= 5 AS le5,
      |  nk BETWEEN 3 AND 8 AS btw, nk IS NULL AS isn, nk IS NOT NULL AS isnn
      |FROM (SELECT s_suppkey, nullif(s_nationkey, 3) AS nk FROM supplier) t
      |ORDER BY s_suppkey""".stripMargin
  ) { (spark, dir) =>
    val nk = nullif(col("s_nationkey"), lit(3))
    Engine.table(spark, dir, "supplier")
      .select(col("s_suppkey"), nk.as("nk"))
      .select(col("s_suppkey"),
        (col("nk") === 5).as("eq5"), (col("nk") =!= 5).as("ne5"),
        (col("nk") > 5).as("gt5"), (col("nk") >= 5).as("ge5"),
        (col("nk") < 5).as("lt5"), (col("nk") <= 5).as("le5"),
        col("nk").between(3, 8).as("btw"),
        col("nk").isNull.as("isn"), col("nk").isNotNull.as("isnn"))
      .orderBy(col("s_suppkey"))
  }

  // --- 3-valued AND/OR/NOT truth table (scalar/bool/{and,or,not}.rs) ------
  val bool3vl: QueryDef = QueryDef.sqlBacked(
    "fn_bool_3vl",
    """SELECT a, b, a AND b AS land, a OR b AS lor, NOT a AS lnot,
      |  a IS TRUE AS istrue, a IS FALSE AS isfalse
      |FROM (SELECT * FROM (VALUES (TRUE),(FALSE),(CAST(NULL AS BOOLEAN))) x(a),
      |              (VALUES (TRUE),(FALSE),(CAST(NULL AS BOOLEAN))) y(b)) t
      |ORDER BY a NULLS FIRST, b NULLS FIRST""".stripMargin
  ) { (spark, _) =>
    spark.sql(
      """SELECT a, b, a AND b AS land, a OR b AS lor, NOT a AS lnot,
        |  a IS NOT NULL AND a AS istrue, a IS NOT NULL AND NOT a AS isfalse
        |FROM (SELECT * FROM VALUES (TRUE),(FALSE),(CAST(NULL AS BOOLEAN)) x(a)
        |      CROSS JOIN VALUES (TRUE),(FALSE),(CAST(NULL AS BOOLEAN)) y(b)) t
        |ORDER BY a NULLS FIRST, b NULLS FIRST""".stripMargin)
  }

  // --- arithmetic incl. div-by-zero → NULL (scalar/maths/*.rs) ------------
  val arith: QueryDef = QueryDef.sqlBacked(
    "fn_arith",
    """SELECT n_nationkey,
      |  n_nationkey + 7 AS add_i, n_nationkey - 7 AS sub_i,
      |  CAST(n_nationkey AS BIGINT) * 1000000007 AS mul_b,
      |  n_nationkey / 4 AS div_d,
      |  n_nationkey % 4 AS mod_i,
      |  n_nationkey / nullif(n_regionkey, n_regionkey) AS div_null,
      |  n_nationkey / 0 AS div_zero,
      |  CAST(CAST(CAST(n_nationkey AS DECIMAL(10,2)) + CAST(0.25 AS DECIMAL(10,2)) AS DECIMAL(11,2)) AS VARCHAR) AS dec_add,
      |  CAST(CAST(CAST(n_nationkey AS DECIMAL(10,2)) * CAST(1.5 AS DECIMAL(4,1)) AS DECIMAL(15,3)) AS VARCHAR) AS dec_mul,
      |  -n_nationkey AS neg
      |FROM nation ORDER BY n_nationkey""".stripMargin
  ) { (spark, dir) =>
    val k = col("n_nationkey")
    Engine.table(spark, dir, "nation").select(
      k,
      (k + 7).as("add_i"), (k - 7).as("sub_i"),
      (k.cast(LongType) * 1000000007L).as("mul_b"),
      (k / 4).as("div_d"),
      (k % 4).as("mod_i"),
      // x/NULL — and division by zero in both engines — yields NULL
      // (reference: divide.rs div-by-zero → NULL; needs ansi=false)
      (k / nullif(col("n_regionkey"), col("n_regionkey"))).as("div_null"),
      (k / lit(0)).as("div_zero"),
      // Decimal results stringified: both engines render a decimal with its
      // full scale ("3.000"), while the driver's pandas compare would strip
      // trailing zeros from one side only (see Tpch.discPrice note).
      (k.cast(DecimalType(10, 2)) + lit(0.25).cast(DecimalType(10, 2)))
        .cast(DecimalType(11, 2)).cast(StringType).as("dec_add"),
      (k.cast(DecimalType(10, 2)) * lit(1.5).cast(DecimalType(4, 1)))
        .cast(DecimalType(15, 3)).cast(StringType).as("dec_mul"),
      (-k).as("neg"))
      .orderBy(k)
  }

  // --- conditionals: if / coalesce / CASE (scalar/misc/*.rs) --------------
  val cond: QueryDef = QueryDef.sqlBacked(
    "fn_cond",
    """SELECT c_custkey,
      |  CASE WHEN c_acctbal > 5000 THEN 'high' ELSE 'low' END AS if_fn,
      |  coalesce(nullif(c_mktsegment, 'BUILDING'), 'fallback') AS coal,
      |  CASE c_nationkey % 3 WHEN 0 THEN 'zero' WHEN 1 THEN 'one' ELSE 'two' END AS branch
      |FROM customer ORDER BY c_custkey""".stripMargin
  ) { (spark, dir) =>
    Engine.table(spark, dir, "customer").select(
      col("c_custkey"),
      when(col("c_acctbal") > 5000, "high").otherwise("low").as("if_fn"),
      coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("fallback")).as("coal"),
      when(col("c_nationkey") % 3 === 0, "zero")
        .when(col("c_nationkey") % 3 === 1, "one")
        .otherwise("two").as("branch"))
      .orderBy(col("c_custkey"))
  }

  // --- casts (scalar/casts/to_*.rs; CAST compiles to these) ---------------
  val casts: QueryDef = QueryDef.sqlBacked(
    "fn_cast",
    """SELECT
      |  CAST('123' AS INT) AS s2i,
      |  CAST(CAST('12.50' AS DECIMAL(10,2)) AS VARCHAR) AS s2d,
      |  CAST(42 AS VARCHAR) AS i2s,
      |  CAST(CAST(1 AS BOOLEAN) AS INT) AS b2i,
      |  CAST(0 AS BOOLEAN) AS i2b,
      |  CAST('2024-03-05 10:30:00' AS TIMESTAMP) AS s2ts,
      |  CAST('true' AS BOOLEAN) AS s2b,
      |  CAST(CAST(2.75 AS DECIMAL(10,2)) AS VARCHAR) AS d2s,
      |  CAST(CAST(1712345678 AS BIGINT) AS DOUBLE) AS l2dbl""".stripMargin
  ) { (spark, _) =>
    spark.range(1).select(
      lit("123").cast(IntegerType).as("s2i"),
      lit("12.50").cast(DecimalType(10, 2)).cast(StringType).as("s2d"),
      lit(42).cast(StringType).as("i2s"),
      lit(1).cast(BooleanType).cast(IntegerType).as("b2i"),
      lit(0).cast(BooleanType).as("i2b"),
      lit("2024-03-05 10:30:00").cast(TimestampNTZType).as("s2ts"),
      lit("true").cast(BooleanType).as("s2b"),
      lit(2.75).cast(DecimalType(10, 2)).cast(StringType).as("d2s"),
      lit(1712345678L).cast(DoubleType).as("l2dbl"))
  }

  // --- date/time: interval arithmetic, extraction, truncation -------------
  // (scalar/date/date_sub.rs:10-32 — date minus N days)
  val datetime: QueryDef = QueryDef.sqlBacked(
    "fn_datetime",
    """SELECT o_orderkey,
      |  o_orderdate - INTERVAL 30 DAY AS date_sub_30,
      |  o_orderdate + INTERVAL 1 DAY AS date_add_1,
      |  CAST(year(o_orderdate) AS INT) AS y,
      |  CAST(month(o_orderdate) AS INT) AS m,
      |  CAST(day(o_orderdate) AS INT) AS d,
      |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mon_start,
      |  CAST(o_orderdate AS DATE) AS as_date
      |FROM orders ORDER BY o_orderkey LIMIT 100""".stripMargin
  ) { (spark, dir) =>
    val od = col("o_orderdate")
    Engine.table(spark, dir, "orders").select(
      col("o_orderkey"),
      (od - expr("INTERVAL 30 DAYS")).as("date_sub_30"),
      (od + expr("INTERVAL 1 DAY")).as("date_add_1"),
      year(od).as("y"), month(od).as("m"), dayofmonth(od).as("d"),
      date_trunc("month", od).cast(TimestampNTZType).as("mon_start"),
      od.cast(DateType).as("as_date"))
      .orderBy(col("o_orderkey")).limit(100)
  }

  // --- strings (Spark-native extension set; portable subset) --------------
  val strings: QueryDef = QueryDef.sqlBacked(
    "fn_string",
    """SELECT p_partkey,
      |  upper(p_name) AS up, lower(p_brand) AS lo,
      |  substring(p_name, 2, 5) AS sub,
      |  CAST(length(p_name) AS INT) AS len,
      |  p_brand || '#' || p_type AS cat,
      |  replace(p_type, 'a', '_') AS repl,
      |  trim('  pad  ') AS trimmed,
      |  lpad(CAST(p_size AS VARCHAR), 5, '0') AS padded,
      |  p_name LIKE '%a%' AS has_a,
      |  starts_with(p_type, 'S') AS pref
      |FROM part ORDER BY p_partkey""".stripMargin
  ) { (spark, dir) =>
    Engine.table(spark, dir, "part").select(
      col("p_partkey"),
      upper(col("p_name")).as("up"), lower(col("p_brand")).as("lo"),
      substring(col("p_name"), 2, 5).as("sub"),
      length(col("p_name")).as("len"),
      concat(col("p_brand"), lit("#"), col("p_type")).as("cat"),
      regexp_replace(col("p_type"), "a", "_").as("repl"),
      trim(lit("  pad  ")).as("trimmed"),
      lpad(col("p_size").cast(StringType), 5, "0").as("padded"),
      col("p_name").like("%a%").as("has_a"),
      col("p_type").startsWith("S").as("pref"))
      .orderBy(col("p_partkey"))
  }

  // --- JSON: -> / ->> over events.props (scalar/json/json_extract.rs) -----
  // `->>` ≡ json_unquote(json_extract(..)) ≡ get_json_object (SURVEY §2.2).
  val json: QueryDef = QueryDef.sqlBacked(
    "fn_json",
    """SELECT event_id,
      |  json_extract_string(props, '$.k') AS k_text,
      |  CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
      |  json_extract_string(props, '$.missing') AS k_missing
      |FROM events ORDER BY event_id LIMIT 200""".stripMargin
  ) { (spark, dir) =>
    Engine.table(spark, dir, "events").select(
      col("event_id"),
      get_json_object(col("props"), "$.k").as("k_text"),
      get_json_object(col("props"), "$.k").cast(IntegerType).as("k_int"),
      get_json_object(col("props"), "$.missing").as("k_missing"))
      .orderBy(col("event_id")).limit(200)
  }

  // --- higher-order array functions (Spark-native extension) --------------
  // The lambda surface the pipeline operators build on (transform/filter/
  // aggregate/zip_with), pinned as scalar outputs (the driver compare
  // cannot hold arrays): integer folds are order-defined and exact, the
  // string join pins sort_array ≡ list_sort. DuckDB spells the fold as
  // list_reduce over a 0-prepended list and zip_with as an index
  // transform — different surface syntax, identical defined semantics,
  // which is what the hash match proves.
  private val arraySpark =
    """SELECT p_partkey,
      |  aggregate(arr, 0L, (a, x) -> a + x) AS arr_sum,
      |  CAST(size(filter(arr, x -> x % 2 = 0)) AS INT) AS n_even,
      |  exists(arr, x -> x > 20) AS any_big,
      |  aggregate(zip_with(arr, arr, (a, b) -> a * b), 0L, (a, x) -> a + x) AS dot_self,
      |  array_join(sort_array(transform(arr, x -> CAST(x AS STRING))), '-') AS joined
      |FROM (SELECT p_partkey,
      |        array(CAST(p_size AS BIGINT), CAST(length(p_name) AS BIGINT),
      |              CAST(length(p_type) AS BIGINT)) AS arr
      |      FROM part) t
      |ORDER BY p_partkey""".stripMargin

  private val arrayOracle =
    """SELECT p_partkey,
      |  list_reduce(list_prepend(CAST(0 AS BIGINT), arr), (a, b) -> a + b) AS arr_sum,
      |  CAST(len(list_filter(arr, x -> x % 2 = 0)) AS INT) AS n_even,
      |  len(list_filter(arr, x -> x > 20)) > 0 AS any_big,
      |  list_reduce(list_prepend(CAST(0 AS BIGINT),
      |    list_transform(range(1, 4), i -> arr[i] * arr[i])), (a, b) -> a + b) AS dot_self,
      |  array_to_string(list_sort(list_transform(arr, x -> CAST(x AS VARCHAR))), '-') AS joined
      |FROM (SELECT p_partkey,
      |        [CAST(p_size AS BIGINT), CAST(length(p_name) AS BIGINT),
      |         CAST(length(p_type) AS BIGINT)] AS arr
      |      FROM part) t
      |ORDER BY p_partkey""".stripMargin

  val arrayFns: QueryDef = QueryDef.sqlBacked("fn_array", arrayOracle) {
    (spark, dir) =>
      Engine.table(spark, dir, "part").createOrReplaceTempView("part")
      spark.sql(arraySpark)
  }

  // --- edit distance (fuzzy-matching building block) ----------------------
  // levenshtein is the standard unit-cost edit distance in both engines;
  // the parity pin is what makes it usable as a portable fuzzy-join
  // residual predicate (block candidates by length/prefix, verify with
  // the distance — same candidates-then-verify shape as the dedup family).
  private val editSql =
    """SELECT s_suppkey,
      |  CAST(levenshtein(s_name, 'Supplier#000000001') AS INT) AS d_ref,
      |  CAST(levenshtein(lower(s_name), lower(s_name)) AS INT) AS d_self
      |FROM supplier ORDER BY s_suppkey""".stripMargin

  val editDist: QueryDef = QueryDef.sqlBacked("fn_editdist", editSql) {
    (spark, dir) =>
      Engine.table(spark, dir, "supplier").createOrReplaceTempView("supplier")
      spark.sql(editSql)
  }

  // --- type_of (scalar/casts/type_of.rs) — Spark type names, pinned -------
  val typeOf: QueryDef = QueryDef.sqlBacked(
    "fn_typeof",
    """SELECT * FROM (VALUES
      | ('bigint', 'string', 'double', 'boolean', 'date', 'decimal(10,2)')
      |) t(t_bigint, t_string, t_double, t_boolean, t_date, t_decimal)""".stripMargin
  ) { (spark, _) =>
    spark.sql(
      """SELECT typeof(CAST(1 AS BIGINT)) AS t_bigint, typeof('x') AS t_string,
        |  typeof(CAST(1.5 AS DOUBLE)) AS t_double, typeof(TRUE) AS t_boolean,
        |  typeof(DATE '2024-01-01') AS t_date,
        |  typeof(CAST(1.5 AS DECIMAL(10,2))) AS t_decimal""".stripMargin)
  }

  // --- aggregates: count/sum/avg incl. NULL handling (aggregate/*) --------
  // avg as exact-decimal sum ÷ count, cast to double (portable, see Tpch).
  val aggregates: QueryDef = QueryDef.sqlBacked(
    "fn_aggregates",
    """SELECT c_mktsegment,
      |  count(*) AS cnt_star,
      |  count(ab) AS cnt_col,
      |  CAST(sum(CAST(ab AS DECIMAL(12,2))) AS DOUBLE) AS sum_bal,
      |  CAST(sum(CAST(ab AS DECIMAL(12,2))) AS DOUBLE) / count(ab) AS avg_bal,
      |  min(ab) AS min_bal, max(ab) AS max_bal,
      |  count(DISTINCT c_nationkey) AS n_nations
      |FROM (SELECT c_mktsegment, c_nationkey,
      |        CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS ab
      |      FROM customer) t
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin
  ) { (spark, dir) =>
    val ab = when(col("c_acctbal") < 0, lit(null)).otherwise(col("c_acctbal")).as("ab")
    Engine.table(spark, dir, "customer")
      .select(col("c_mktsegment"), col("c_nationkey"), ab)
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("cnt_star"),
        count(col("ab")).as("cnt_col"),
        sum(col("ab").cast(DecimalType(12, 2))).cast(DoubleType).as("sum_bal"),
        (sum(col("ab").cast(DecimalType(12, 2))).cast(DoubleType) / count(col("ab"))).as("avg_bal"),
        min(col("ab")).as("min_bal"), max(col("ab")).as("max_bal"),
        countDistinct(col("c_nationkey")).as("n_nations"))
      .orderBy(col("c_mktsegment"))
  }

  // --- approximate aggregates (scale extension) ---------------------------
  // Sketch values (HLL, GK quantiles) are engine-specific, so the oracle
  // checks the *error contract* instead: the Spark side emits the exact
  // value plus booleans asserting each sketch landed inside its bound, and
  // the oracle emits the exact value plus TRUE — a hash match means the
  // sketches actually honored their accuracy guarantees.
  val approx: QueryDef = QueryDef.sqlBacked(
    "fn_approx",
    """SELECT count(DISTINCT l_orderkey) AS exact_orders,
      |  TRUE AS hll_within_2pct,
      |  TRUE AS median_in_band,
      |  TRUE AS p95_in_band
      |FROM lineitem""".stripMargin
  ) { (spark, dir) =>
    // Two single-row aggregations, cross-joined: mixing count(DISTINCT)
    // with the object-buffer sketch aggregates forces the distinct-rewrite
    // onto a sort-based single pass over every buffer (measured 50s at
    // sf0.1 vs 3s + 1.3s split). Percentile bands use the array form so
    // each column's exact quantiles share one value-count map.
    val li = Engine.table(spark, dir, "lineitem")
    val sketches = li.agg(
      approx_count_distinct(col("l_orderkey"), rsd = 0.01).as("hll"),
      percentile_approx(col("l_quantity"), lit(0.5), lit(10000)).as("med"),
      percentile_approx(col("l_extendedprice"), lit(0.95), lit(10000)).as("p95"),
      expr("percentile(l_quantity, array(0.48D, 0.52D))").as("qband"),
      expr("percentile(l_extendedprice, array(0.94D, 0.96D))").as("pband"))
    val exact = li.agg(countDistinct(col("l_orderkey")).as("exact_orders"))
    exact.crossJoin(sketches)
      .select(
        col("exact_orders"),
        (abs(col("hll") - col("exact_orders")) <= col("exact_orders") * 0.02)
          .as("hll_within_2pct"),
        col("med").between(element_at(col("qband"), 1), element_at(col("qband"), 2))
          .as("median_in_band"),
        col("p95").between(element_at(col("pband"), 1), element_at(col("pband"), 2))
          .as("p95_in_band"))
  }

  // --- reference registry names (tests/show/functions.rs) -----------------
  // The callable to_* / is-predicate family registered by GraftExtensions,
  // oracle-verified over edge inputs where Spark's non-ANSI cast and
  // DuckDB's TRY_CAST agree: valid literals, whitespace trim, garbage →
  // NULL, empty → NULL. ('3.7' AS INT is the one documented divergence —
  // Spark truncates to 3, DuckDB rounds to 4 — and stays out of the set.)
  val registry: QueryDef = QueryDef.sqlBacked(
    "fn_registry",
    """SELECT
      |  TRY_CAST('12' AS INTEGER) AS i_ok,
      |  TRY_CAST('abc' AS INTEGER) AS i_bad,
      |  TRY_CAST('' AS INTEGER) AS i_empty,
      |  TRY_CAST(' 7 ' AS INTEGER) AS i_trim,
      |  TRY_CAST('-5' AS BIGINT) AS l_neg,
      |  TRY_CAST('true' AS BOOLEAN) AS b_word,
      |  TRY_CAST('1' AS BOOLEAN) AS b_num,
      |  TRY_CAST('x' AS BOOLEAN) AS b_bad,
      |  CAST(TRY_CAST('1.25' AS DECIMAL(28,14)) AS DOUBLE) AS dec_ok,
      |  CAST('graft' AS VARCHAR) AS t_id,
      |  (NULL IS TRUE) AS it_null,
      |  (TRY_CAST('1' AS BOOLEAN) IS TRUE) AS it_true,
      |  (false IS FALSE) AS if_false,
      |  (NULL IS NULL) AS in_null""".stripMargin
  ) { (spark, _) =>
    spark.sql(
      """SELECT
        |  to_int('12') AS i_ok,
        |  to_int('abc') AS i_bad,
        |  to_int('') AS i_empty,
        |  to_int(' 7 ') AS i_trim,
        |  to_bigint('-5') AS l_neg,
        |  to_bool('true') AS b_word,
        |  to_bool('1') AS b_num,
        |  to_bool('x') AS b_bad,
        |  CAST(to_decimal('1.25') AS DOUBLE) AS dec_ok,
        |  to_text('graft') AS t_id,
        |  istrue(NULL) AS it_null,
        |  istrue(to_bool('1')) AS it_true,
        |  isfalse(false) AS if_false,
        |  isnull(NULL) AS in_null""".stripMargin)
  }

  // --- exact percentiles: linear-interpolation quantiles ------------------
  // Spark `percentile` and DuckDB `quantile_cont` share the definition
  // pos = p·(n−1), result = x_lo + frac·(x_hi − x_lo). l_quantity values
  // are integer-valued doubles and p ∈ {¼, ½, ¾}, so every interpolated
  // value is an exact binary quarter — bit-identical across engines with
  // no rounding slack. (Exact percentile is a full sort per group; the
  // scale path for 100 TB is fn_approx's approx_percentile sketch — this
  // query is the exactness anchor the sketch is judged against.)
  private val percentileOracle =
    """SELECT l_returnflag,
      |  quantile_cont(l_quantity, 0.25) AS p25,
      |  quantile_cont(l_quantity, 0.5)  AS p50,
      |  quantile_cont(l_quantity, 0.75) AS p75,
      |  median(l_quantity) AS med,
      |  count(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  val percentile: QueryDef = QueryDef.sqlBacked("fn_percentile", percentileOracle) {
    (spark, dir) =>
      Engine.table(spark, dir, "lineitem").createOrReplaceTempView("lineitem")
      spark.sql(
        """SELECT l_returnflag,
          |  percentile(l_quantity, 0.25) AS p25,
          |  percentile(l_quantity, 0.5)  AS p50,
          |  percentile(l_quantity, 0.75) AS p75,
          |  median(l_quantity) AS med,
          |  count(*) AS n
          |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
  }

  // --- statistical aggregates from exact moments --------------------------
  // stddev/covar/corr are computed from exact DECIMAL power sums (order-
  // independent, so distributed aggregation is deterministic), then one
  // fixed double expression tree shared verbatim by both engines — every
  // IEEE op has identical operands, so results are bit-identical. This is
  // also the scale-correct design: a streaming Welford pass is sequential,
  // while power sums are a single map-side-combined aggregation.
  private def statsSql(table: String): String =
    s"""WITH m AS (
       |  SELECT l_returnflag,
       |    CAST(count(*) AS DOUBLE) AS n,
       |    CAST(sum(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS sx,
       |    CAST(sum(CAST(l_quantity AS DECIMAL(14,2)) * CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS sxx,
       |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
       |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy,
       |    CAST(sum(CAST(l_quantity AS DECIMAL(14,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
       |  FROM $table GROUP BY l_returnflag)
       |SELECT l_returnflag,
       |  sx / n AS mean_qty,
       |  sqrt((sxx - sx * sx / n) / (n - 1)) AS stddev_qty,
       |  sqrt((syy - sy * sy / n) / (n - 1)) AS stddev_price,
       |  (sxy - sx * sy / n) / (n - 1) AS covar_qty_price,
       |  (n * sxy - sx * sy)
       |    / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS corr_qty_price
       |FROM m ORDER BY l_returnflag""".stripMargin

  val stats: QueryDef = QueryDef.sqlBacked("fn_stats", statsSql("lineitem")) {
    (spark, dir) =>
      Engine.table(spark, dir, "lineitem").createOrReplaceTempView("lineitem")
      spark.sql(statsSql("lineitem"))
  }

  // --- bitwise operators (Spark-native extension; DuckDB dialect: `xor`
  // is a function and `^` is exponentiation, so the oracle text differs
  // while the semantics are pinned identical) ------------------------------
  val bitwise: QueryDef = QueryDef.sqlBacked(
    "fn_bitwise",
    """SELECT s_suppkey,
      |  CAST(s_suppkey & 12 AS BIGINT) AS band,
      |  CAST(s_suppkey | 5 AS BIGINT) AS bor,
      |  CAST(xor(s_suppkey, 21) AS BIGINT) AS bxor,
      |  CAST(~s_suppkey AS BIGINT) AS bnot,
      |  CAST((s_suppkey % 16) << 3 AS BIGINT) AS shl,
      |  CAST(s_suppkey >> 2 AS BIGINT) AS shr,
      |  CAST(bit_count(s_suppkey) AS INT) AS bcnt
      |FROM supplier ORDER BY s_suppkey""".stripMargin
  ) { (spark, dir) =>
    Engine.table(spark, dir, "supplier").createOrReplaceTempView("supplier")
    spark.sql(
      """SELECT s_suppkey,
        |  CAST(s_suppkey & 12 AS BIGINT) AS band,
        |  CAST(s_suppkey | 5 AS BIGINT) AS bor,
        |  CAST(s_suppkey ^ 21 AS BIGINT) AS bxor,
        |  CAST(~s_suppkey AS BIGINT) AS bnot,
        |  CAST(shiftleft(s_suppkey % 16, 3) AS BIGINT) AS shl,
        |  CAST(shiftright(s_suppkey, 2) AS BIGINT) AS shr,
        |  CAST(bit_count(s_suppkey) AS INT) AS bcnt
        |FROM supplier ORDER BY s_suppkey""".stripMargin)
  }

  // --- ordered string aggregation -----------------------------------------
  // Spark has no ordered string_agg, so the deterministic spelling is
  // sort_array ∘ collect_list ∘ concat_ws — the sort is per GROUP (bounded
  // by the group's cardinality), not a global exchange, so the plan is the
  // usual partial+final hash aggregation. The oracle is DuckDB's native
  // `string_agg(... ORDER BY ...)`; equality pins that the Spark spelling
  // realizes the same ordered-concat semantics.
  val stringAgg: QueryDef = QueryDef.sqlBacked(
    "fn_string_agg",
    """SELECT n_regionkey,
      |  string_agg(n_name, ',' ORDER BY n_name) AS names,
      |  count(*) AS n
      |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin
  ) { (spark, dir) =>
    Engine.table(spark, dir, "nation").createOrReplaceTempView("nation")
    spark.sql(
      """SELECT n_regionkey,
        |  concat_ws(',', sort_array(collect_list(n_name))) AS names,
        |  count(*) AS n
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin)
  }

  val all: Seq[QueryDef] = Seq(
    compare, bool3vl, arith, cond, casts, datetime, strings, json, typeOf,
    aggregates, approx, registry, percentile, stats, bitwise, stringAgg,
    arrayFns, editDist)
}
