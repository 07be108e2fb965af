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

  test("incremental index append is indistinguishable from a full rebuild") {
    import org.apache.spark.sql.functions._
    val vectors = Engine.table(spark, dir, "embeddings")
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
    val full = java.nio.file.Files
      .createTempDirectory("graft_ivf_full_").resolve("index").toString
    val inc = java.nio.file.Files
      .createTempDirectory("graft_ivf_inc_").resolve("index").toString
    queries.Similarity.writeIvfIndex(vectors, full)
    // incremental: 90% at build time, the rest appended as a new batch
    queries.Similarity.writeIvfIndex(vectors.filter(col("vec_id") % 10 =!= 0), inc)
    queries.Similarity.writeIvfIndex(
      vectors.filter(col("vec_id") % 10 === 0), inc, mode = "append")
    val a = queries.Similarity.probeIvfIndex(spark, dir, full).collect()
    val b = queries.Similarity.probeIvfIndex(spark, dir, inc).collect()
    assert(a.nonEmpty && a.length == b.length)
    a.zip(b).foreach { case (x, y) => assert(x == y) }
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

  test("recall@10 floor at the default probe width; exhaustive probe is exact") {
    // The tuning loop's committed quality bar (VERDICT r9 #4): the default
    // nProbe=4 of 16 cells must keep recall@10 at or above its measured
    // value on the test corpus (0.4125 — pinned with slack for nothing;
    // any centroid/assignment/probe regression shows up here before it
    // degrades a production sweep). nProbe=16 probes every cell, so the
    // "approximate" search IS the exact search — anything under 1.0 means
    // candidates are being lost somewhere other than probe selection.
    val sf = "/root/testdata/sf0.001"
    val atDefault = queries.Similarity.meanRecallAtNProbe(spark, sf, 4)
    assert(atDefault >= 0.4125,
      f"recall@10 at default nProbe=4 dropped to $atDefault%.4f (floor 0.4125)")
    val exhaustive = queries.Similarity.meanRecallAtNProbe(spark, sf, 16)
    assert(exhaustive == 1.0,
      f"exhaustive probe lost candidates: recall@10=$exhaustive%.4f")
  }
}
