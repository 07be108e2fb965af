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
      maxRounds: Int = 50, localFinishEdges: Long = 0L): (Map[Long, Long], Int) = {
    // localFinishEdges = 0 forces the DISTRIBUTED star rounds — these
    // pins must keep exercising the scale path, not the driver finisher
    val nodes = (0L until n.toLong).toDF("doc")
    val pairs = edges.toDF("id_a", "id_b")
    val (lab, rounds) =
      queries.Dedup.connectedComponents(nodes, pairs, maxRounds, localFinishEdges)
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

  test("labels match a local union-find on adversarial pseudo-random graphs") {
    // the fixpoint is nominated by a (count, Σu, Σv) fingerprint and must
    // be CONFIRMED by set equality — a premature exit on a fingerprint
    // collision would show up here as a labeling that disagrees with the
    // ground-truth union-find
    def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      (0 until n).map(i => i.toLong -> find(i).toLong).toMap
    }
    // deterministic LCG so the spec is reproducible
    var seed = 0x5DEECE66DL
    def nextInt(bound: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (((seed >>> 33) % bound + bound) % bound).toInt
    }
    for (trial <- 1 to 5) {
      val n = 40 + trial * 17
      val edges = Seq.fill(n / 2)((nextInt(n).toLong, nextInt(n).toLong))
      val (lab, _) = labelsOf(n, edges)
      assert(lab == unionFind(n, edges), s"trial $trial (n=$n) diverged from union-find")
    }
  }

  test("driver finisher labels exactly as the distributed star rounds") {
    var seed = 0x2545F4914F6CDD1DL
    def nextInt(bound: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (((seed >>> 33) % bound + bound) % bound).toInt
    }
    for (trial <- 1 to 4) {
      val n = 30 + trial * 23
      val edges = Seq.fill(n)((nextInt(n).toLong, nextInt(n).toLong))
      val (viaLocal, r1) = labelsOf(n, edges, localFinishEdges = 1000000L)
      val (viaRounds, _) = labelsOf(n, edges, localFinishEdges = 0L)
      assert(r1 == 0, "small graphs must take the driver finisher immediately")
      assert(viaLocal == viaRounds, s"trial $trial (n=$n): finisher diverged")
    }
  }

  test("hitting the round cap without a fixpoint throws loudly") {
    val chain = (0L until 63L).map(i => (i, i + 1))
    val e = intercept[IllegalStateException](labelsOf(64, chain, maxRounds = 1))
    assert(e.getMessage.contains("did not reach a fixpoint"))
  }
}
