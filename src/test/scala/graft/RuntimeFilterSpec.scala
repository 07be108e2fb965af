package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins Catalyst's runtime bloom-filter injection on the selective-join
  * shape (SCALE.md "Joins"): when a shuffle join's build side is small
  * and filtered, the optimizer plants a bloom filter from the build side
  * onto the probe side's scan, so most non-matching fact rows die before
  * the exchange. This is the declarative-joins payoff at 100 TB — the
  * engine, not the query author, decides to semi-join-reduce the fact
  * table; the query text stays a plain join.
  */
class RuntimeFilterSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("a selective shuffle join injects a runtime bloom filter on the fact side") {
    val dir = "/root/testdata/sf0.01"
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB") {
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
      val ord = spark.read.parquet(s"$dir/orders.parquet")
        .filter("o_totalprice > 400000")
      val j = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .groupBy("o_orderstatus").count()
      val optimized = j.queryExecution.optimizedPlan.toString
      assert(optimized.contains("bloom_filter") || optimized.contains("BloomFilter"),
        "no bloom filter injected into the optimized plan:\n" + optimized)
      // and the filtered result is still exactly the unfiltered join's
      val expected = spark.read.parquet(s"$dir/lineitem.parquet")
        .join(spark.read.parquet(s"$dir/orders.parquet").filter("o_totalprice > 400000"),
          org.apache.spark.sql.functions.expr("l_orderkey = o_orderkey"))
        .groupBy("o_orderstatus").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = j.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expected)
    }
  }

  private def withConfs(confs: (String, String)*)(body: => Unit): Unit = {
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { confs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
