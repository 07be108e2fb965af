package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the generic as-of combinator against the declarative spelling
  * (LEFT LATERAL ... ORDER BY ts DESC LIMIT 1) on real event data, plus
  * the single-shuffle plan property that justifies its union+window shape.
  */
class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("asOf equals the lateral top-1 spelling on events (ties inclusive)") {
    val events = Engine.table(spark, sf, "events")
    val purchases = events.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"),
        col("event_id").as("v_id"), col("value").as("v_value"))

    val got = AsOfJoin.asOf(purchases, views, Seq("user_id"),
        leftTime = "ts", rightTime = "ts", rightTieBreak = Seq("v_id"))
      .select("event_id", "v_id", "v_value")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1.0 else r.getDouble(2)))
      .sortBy(_._1)

    purchases.createOrReplaceTempView("asof_p")
    views.createOrReplaceTempView("asof_v")
    val expected = spark.sql(
      """SELECT p.event_id, x.v_id, x.v_value
        |FROM asof_p p LEFT JOIN LATERAL (
        |  SELECT v_id, v_value FROM asof_v v
        |  WHERE v.user_id = p.user_id AND v.ts <= p.ts
        |  ORDER BY v.ts DESC, v_id DESC LIMIT 1) x
        |""".stripMargin)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1.0 else r.getDouble(2)))
      .sortBy(_._1)

    assert(got.nonEmpty && got.count(_._2 == -1L) < got.length,
      "test data produced no matches — vacuous")
    assert(got.sameElements(expected))
  }

  test("the plan shuffles once, on the key — no range join, no product") {
    val events = Engine.table(spark, sf, "events")
    val df = AsOfJoin.asOf(
      events.filter(col("event_type") === "purchase").select("event_id", "user_id", "ts"),
      events.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("value").as("v_value")),
      Seq("user_id"), "ts", "ts")
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "as-of degenerated to a product join")
    val exchanges = "hashpartitioning\\(user_id".r.findAllIn(p).size
    assert(exchanges >= 1 && !p.contains("SortMergeJoin"),
      "expected the union+window shape, not a join")
  }
}
