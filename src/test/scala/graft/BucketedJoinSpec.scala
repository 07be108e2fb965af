package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Substantiates SCALE.md's co-location claim: when the two fact tables
  * are bucketed on the join key at ingest, the join plans with ZERO
  * shuffle exchanges — the setup that carries orders⋈lineitem past
  * broadcast range at 100 TB.
  */
class BucketedJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("bucketed orders and lineitem join without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    Engine.table(spark, sf, "orders")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    Engine.table(spark, sf, "lineitem")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")

    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("q"))

    val plan = joined.queryExecution.executedPlan.toString
    // the join itself must not introduce a shuffle: the only allowed
    // exchange is the final groupBy aggregation
    val joinPart = plan.split("HashAggregate").last
    assert(!joinPart.contains("Exchange hashpartitioning(l_orderkey"),
      s"join shuffled lineitem:\n$plan")
    assert(!joinPart.contains("Exchange hashpartitioning(o_orderkey"),
      s"join shuffled orders:\n$plan")

    // and it still computes the right answer
    val got = joined.collect().map(r => r.getString(0) -> r.getDecimal(1)).toMap
    val exp = Engine.table(spark, sf, "lineitem")
      .join(Engine.table(spark, sf, "orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("q"))
      .collect().map(r => r.getString(0) -> r.getDecimal(1)).toMap
    assert(got == exp)

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
  }

  test("layout_bucketed_join plans with zero Exchange and zero Sort nodes") {
    // The census surface (Layout.bucketedJoin) goes further than the
    // test above: it joins AND aggregates on the bucket key and finishes
    // with ORDER BY + LIMIT — so the whole plan is
    // scan → SMJ → partial+final agg → TakeOrderedAndProject with NO
    // exchange ANYWHERE: the join is co-located by bucketing and the
    // aggregation's distribution requirement is satisfied by the same
    // bucketing (SortAggregate directly over the join, no re-shuffle),
    // and the top-50 runs as TakeOrdered, not a global sort. That is the
    // whole point of bucket-at-ingest at 100 TB: every downstream
    // orderkey-keyed join/agg stops paying exchanges. The only remaining
    // Sort nodes are PARTITION-LOCAL (global=false) over the per-bucket
    // sorted files: Spark ≥3.0 deliberately stopped propagating bucket
    // sort metadata to the scan's outputOrdering (SPARK-28595 — unsafe
    // when a bucket has >1 file), so SMJ re-sorts locally; those sorts
    // carry no exchange and run over already-sorted runs.
    val df = queries.Layout.bucketedJoin(spark, sf)
    df.collect() // force AQE-final plan
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected exchange:\n$plan")
    assert(!plan.contains("Sort [revenue"), s"global sort should be TakeOrdered:\n$plan")
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k:\n$plan")
    // layout independence: same rows as the oracle's plain-join spelling
    // run over the raw parquet (the oracle SQL is Spark-compatible here)
    Engine.table(spark, sf, "lineitem").createOrReplaceTempView("lineitem")
    Engine.table(spark, sf, "orders").createOrReplaceTempView("orders")
    val plain = spark.sql(queries.Layout.bucketed.oracle.get)
    assert(df.collect().toSeq == plain.collect().toSeq)
  }
}
