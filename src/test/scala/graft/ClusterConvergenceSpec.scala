package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the doubling behavior and edge semantics of the
  * large-star/small-star connected-components kernel behind
  * dedup_clusters (correctness of the full operator is the DuckDB
  * recursive-CTE oracle's job; these pin the SCALE property — round
  * count logarithmic in diameter, not linear — and the loud-failure
  * contract).
  */
class ClusterConvergenceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def labelsOf(n: Int, edges: Seq[(Long, Long)],
      maxRounds: Int = 50): (Map[Long, Long], Int) = {
    val nodes = (0L until n.toLong).toDF("doc")
    val pairs = edges.toDF("id_a", "id_b")
    val (lab, rounds) = queries.Dedup.connectedComponents(nodes, pairs, maxRounds)
    (lab.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap, rounds)
  }

  test("chain of diameter 63 converges in <= ceil(log2 63)+1 = 7 rounds, one cluster") {
    val chain = (0L until 63L).map(i => (i, i + 1))
    val (lab, rounds) = labelsOf(64, chain)
    assert(lab.values.toSet == Set(0L), "chain must collapse to cluster 0")
    assert(rounds <= 7, s"expected <= 7 doubling rounds for diameter 63, took $rounds")
  }

  test("disjoint components each label by their minimum; singletons keep their id") {
    val (lab, _) = labelsOf(10,
      Seq((1L, 2L), (2L, 3L), (5L, 6L), (6L, 5L), (8L, 8L))) // dup + self edges too
    assert(lab == Map(
      0L -> 0L, 1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L,
      5L -> 5L, 6L -> 5L, 7L -> 7L, 8L -> 8L, 9L -> 9L))
  }

  test("edgeless graph converges immediately in zero rounds") {
    val (lab, rounds) = labelsOf(4, Seq.empty)
    assert(rounds == 0)
    assert(lab == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("hitting the round cap without a fixpoint throws loudly") {
    val chain = (0L until 63L).map(i => (i, i + 1))
    val e = intercept[IllegalStateException](labelsOf(64, chain, maxRounds = 1))
    assert(e.getMessage.contains("did not reach a fixpoint"))
  }
}
