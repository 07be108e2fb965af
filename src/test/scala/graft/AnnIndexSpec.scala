package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the materialized IVF index's two contracts:
  *   1. the layout is invisible in the result (indexed ≡ index-free);
  *   2. probes PRUNE — the index scan plans a dynamic-partition-pruning
  *      subquery on the cell partition column, so unprobed cells' files
  *      are skipped at runtime (the property the partitioned write
  *      exists for).
  */
class AnnIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("indexed IVF probe returns exactly the index-free IVF result") {
    val plain = queries.Similarity.ivfTopK(spark, dir).collect()
    val indexed = queries.Similarity.ivfIndexedTopK(spark, dir).collect()
    assert(indexed.length == plain.length && plain.nonEmpty)
    indexed.zip(plain).foreach { case (a, b) => assert(a == b) }
  }

  test("the probe join dynamically prunes index partitions") {
    val df = queries.Similarity.ivfIndexedTopK(spark, dir)
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("dynamicpruningexpression"),
      "index scan lost its dynamic partition pruning subquery:\n" + physical)
    // the pruning is ON the partition column of the index scan
    assert(physical.contains("PartitionFilters") && physical.contains("cell"),
      "partition filters on cell missing from the index scan")
  }
}
