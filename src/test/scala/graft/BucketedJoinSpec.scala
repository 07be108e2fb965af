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
}
