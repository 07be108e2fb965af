package graft

import graft.queries.Similarity
import org.scalatest.funsuite.AnyFunSuite

/** Scale pins for broadcast-matrix cell assignment: at C=256 (past any
  * reasonable SQL-literal matrix) the assignment must stay a pure
  * projection — no Exchange before the cell column exists — and agree
  * exactly with a driver-side argmax re-computation, and with the
  * plan-literal argmax_dot kernel on the C=16 matrix both paths share.
  */
class CentroidBroadcastSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def vectors = {
    Engine.table(spark, sf, "embeddings").createOrReplaceTempView("embeddings")
    spark.sql(
      """SELECT vec_id, transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |FROM embeddings""".stripMargin)
  }

  test("C=256: assignment is a projection with no Exchange, and matches driver argmax") {
    val cents = Similarity.hashCentroids(256)
    val assigned = Similarity.assignCells(vectors, "v", "cell", cents)

    val plan = assigned.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(!plan.contains("Exchange"),
      s"cell assignment at C=256 is no longer a shuffle-free projection:\n$plan")
    assert(plan.contains("argmax_dot_bc"), "broadcast argmax kernel missing from plan")

    val rows = assigned.selectExpr("vec_id", "v", "cell").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getSeq[Double](1).toArray
      // first-max-wins tie-break, identical fold order → exact equality
      var best = 0.0; var bestIdx = 0
      cents.indices.foreach { p =>
        var s = 0.0; var d = 0
        while (d < v.length) { s += v(d) * cents(p)(d); d += 1 }
        if (p == 0 || s > best) { best = s; bestIdx = p }
      }
      assert(r.getInt(2) == bestIdx, s"vec ${r.getLong(0)}: got ${r.getInt(2)}, want $bestIdx")
    }
  }

  test("C=16: broadcast path equals the plan-literal argmax_dot kernel") {
    val viaBc = Similarity.assignCells(vectors, "v", "cell", Similarity.hashCentroids(16))
      .selectExpr("vec_id", "cell").collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val viaLit = vectors.selectExpr("vec_id",
        s"argmax_dot(v, ${Similarity.centroidMatrixSql}) AS cell")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(viaBc == viaLit)
  }

  test("broadcast IVF index at C=64: partition pruning still applies on probe") {
    val idx = java.nio.file.Files
      .createTempDirectory("graft_ivf_bc_").resolve("index").toString
    Similarity.writeIvfIndexAt(vectors, idx, Similarity.hashCentroids(64))
    val index = spark.read.parquet(idx)
    assert(index.columns.sorted.toSeq == Seq("cand_id", "cell", "cv"))
    // cell is the partition column → a cell-equality filter prunes files
    val probe = index.filter("cell = 3")
    val plan = probe.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("PartitionFilters: [isnotnull(cell"),
      s"cell filter not applied as a partition filter:\n$plan")
  }
}
