package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row

/** Semantics + plan-shape pins for the analytic SQL surface
  * (queries/Analytic.scala) and the new function/window/heavy-hitter ops.
  *
  * The scale-relevant property of every subquery here is that Catalyst
  * decorrelates it into a joinable shape (semi/anti/scalar-broadcast) —
  * never a per-row re-execution — so these tests assert the join strategy,
  * not just the result.
  */
class AnalyticSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)
  private def plan(name: String): String =
    run(name).queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)

  test("op_subquery_in decorrelates to a semi join, not a per-row subquery") {
    val p = plan("op_subquery_in")
    assert(p.contains("LeftSemi"), s"IN subquery did not become a semi join:\n$p")
    assert(!p.contains("InSubquery"), "IN remained an uncorrelated per-row subquery")
  }

  test("op_subquery_exists plans one semi and one anti join") {
    val p = plan("op_subquery_exists")
    assert(p.contains("LeftSemi"), "EXISTS did not become a semi join")
    assert(p.contains("LeftAnti"), "NOT EXISTS did not become an anti join")
  }

  test("op_subquery_notin: a NULL in the list voids every NOT IN row (3VL)") {
    val rows = run("op_subquery_notin").collect()
    val byVariant = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byVariant("with_null") == 0L,
      "NOT IN over a NULL-bearing list must select nothing")
    assert(byVariant("no_null") > 0L, "control variant unexpectedly empty")
  }

  test("op_subquery_scalar: ratio > 1.5 for every surviving row; scalar subqueries not re-executed per row") {
    val rows = run("op_subquery_scalar").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getDouble(1) > 1.5))
    val p = plan("op_subquery_scalar")
    // Catalyst plans scalar subqueries once as Subquery/ReusedSubquery stages
    assert(p.contains("Subquery"), "scalar subquery missing from plan")
  }

  test("op_grouping_sets: one Expand + one aggregation, not one scan per set") {
    val p = plan("op_grouping_sets")
    val expands = """\(\d+\) Expand""".r.findAllIn(p).size
    assert(expands == 1, s"expected exactly 1 Expand, got $expands")
    val scans = """\(\d+\) Scan parquet""".r.findAllIn(p).size
    assert(scans == 1, s"grouping sets re-scanned the table: $scans scans")
  }

  test("op_cube totals: grand total row equals table count") {
    val rows = run("op_cube").collect()
    val grand = rows.filter(r => r.getInt(2) == 1 && r.getInt(3) == 1)
    assert(grand.length == 1)
    val total = Engine.table(spark, sf, "orders").count()
    assert(grand.head.getLong(4) == total)
  }

  test("op_unnest: positions are 1-based, contiguous per doc, and Generate stays unshuffled") {
    val rows = run("op_unnest").limit(50).collect()
    assert(rows.nonEmpty)
    val firstDoc = rows.head.getLong(0)
    val pos = rows.takeWhile(_.getLong(0) == firstDoc).map(_.getInt(1))
    assert(pos.head == 1 && pos.sameElements(1 to pos.length),
      s"positions not contiguous 1-based: ${pos.mkString(",")}")
    val p = plan("op_unnest")
    assert(p.contains("Generate"), "posexplode missing")
    // the only exchange should be the presentation sort's range partitioning
    assert(!p.contains("hashpartitioning"),
      "unnest introduced a hash shuffle — flatMap must stay in the scan stage")
  }

  test("fn_stats matches Spark's own corr/stddev to float tolerance") {
    // The exact-moment formulation must agree with Spark's built-in
    // streaming aggregates up to double noise — this guards against a
    // formula typo that the (self-consistent) DuckDB oracle would miss.
    import org.apache.spark.sql.functions._
    val li = Engine.table(spark, sf, "lineitem")
    val expect = li.groupBy("l_returnflag")
      .agg(corr(col("l_quantity"), col("l_extendedprice")).as("c"),
        stddev_samp(col("l_quantity")).as("s"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    run("fn_stats").collect().foreach { r =>
      val (c, s) = expect(r.getString(0))
      assert(math.abs(r.getDouble(5) - c) < 1e-9, s"corr mismatch for ${r.getString(0)}")
      assert(math.abs(r.getDouble(2) - s) < 1e-9, s"stddev mismatch for ${r.getString(0)}")
    }
  }

  test("fn_percentile: p50 equals median and sits between p25 and p75") {
    run("fn_percentile").collect().foreach { r =>
      val (p25, p50, p75, med) =
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(p50 == med)
      assert(p25 <= p50 && p50 <= p75)
    }
  }

  test("evt_window_range: trailing 1h frame never exceeds the running total and counts are positive") {
    val rows = run("evt_window_range").limit(200).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getInt(4) >= 1), "RANGE frame must include the current row")
  }

  test("ta_heavy_hitters is exact: equals the full groupBy result") {
    import org.apache.spark.sql.functions._
    val got = run("ta_heavy_hitters").collect().map(r => r.getString(0) -> r.getLong(1))
    val toks = Engine.table(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("tok")).where(col("tok") =!= "")
    val n = toks.count()
    val brute = toks.groupBy("tok").count()
      .where(col("count") * 200 >= n)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSet
    assert(got.toSet == brute, "Misra-Gries candidate pass lost a heavy hitter")
    assert(got.nonEmpty)
  }

  test("op_lateral_join: LIMIT'd lateral decorrelates to WindowGroupLimit top-k, never a per-row loop") {
    val p = plan("op_lateral_join")
    assert(p.contains("WindowGroupLimit"),
      "lateral top-k must plan partial per-key limits before the exchange")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "lateral degenerated to a product join")
    val rows = run("op_lateral_join").collect()
    val perCust = rows.groupBy(_.getLong(0)).values.map(_.length)
    assert(perCust.forall(_ <= 2), "lateral LIMIT 2 exceeded")
  }

  test("evt_gapfill: series is hourly-contiguous per user; forward fill carries last observation") {
    val rows = run("evt_gapfill").collect()
    val byUser = rows.groupBy(_.getLong(0))
    byUser.values.foreach { series =>
      val hours = series.map(_.getTimestamp(1).getTime)
      assert(hours.zip(hours.tail).forall { case (a, b) => b - a == 3600L * 1000 },
        "grid has a non-hourly step")
      // on observed hours the forward fill equals the observation
      series.filterNot(_.getBoolean(3)).foreach { r =>
        assert(r.getLong(4) == r.getLong(2), "cents_ff diverged on an observed hour")
      }
      // gap rows report 0 observed cents
      series.filter(_.getBoolean(3)).foreach(r => assert(r.getLong(2) == 0L))
    }
    assert(rows.exists(_.getBoolean(3)), "no gaps in the grid — fill path untested")
  }

  test("fn_string_agg is deterministic: names sorted ascending within each group") {
    run("fn_string_agg").collect().foreach { r =>
      val names = r.getString(1).split(',').toSeq
      assert(names == names.sorted, s"unsorted agg for region ${r.get(0)}")
      assert(names.length == r.getLong(2))
    }
  }

  test("ta_heavy_hitters plan: candidate filter is a broadcast semi join before the count shuffle") {
    val p = plan("ta_heavy_hitters")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      "exact-count pass must probe a broadcast candidate set")
  }
}
