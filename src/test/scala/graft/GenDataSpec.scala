package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the embedding-replication invariants every big-tier claim rests
  * on (GenData.scala, r11 sign-pattern lift):
  *   1. replicas below 2·dims reproduce the pre-r11 identity/negate
  *      scheme bit for bit — regenerating sf1/sf10 cannot move them;
  *   2. intra-replica dot products equal replica 0's EXACTLY for every
  *      wrap level (a shared per-dimension ± pattern cancels, s_d² = 1)
  *      — the top-k/dedup structure ANN workloads measure is scale-
  *      invariant by construction, not by luck;
  *   3. same-rotation cross-replica pairs never reach the 0.9 near-dup
  *      threshold on this corpus — the cosine-1.0 pair explosion the
  *      old factor-128 cycle caused cannot recur.
  */
class GenDataSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("factor-200 replication: bit-compat, exact intra-replica structure, no wrap dups") {
    import spark.implicits._
    val dims = 64
    // deterministic unit-norm base vectors. They must be i.i.d.-random
    // like the real corpus: the rotation trick (old scheme and new) only
    // decorrelates replicas of rotation-decorrelated vectors — a first
    // draft of this spec used sinusoids and correctly FAILED (shift by
    // ~2π/step ≈ identity ⇒ same-wrap-level replicas at cos 0.9988).
    val base = (0 until 5).map { v =>
      val rnd = new scala.util.Random(42 + v)
      val raw = (0 until dims).map(_ => rnd.nextGaussian().toFloat)
      val n = math.sqrt(raw.map(x => x.toDouble * x).sum)
      (v.toLong, raw.map(x => (x / n).toFloat))
    }
    val inDir = java.nio.file.Files.createTempDirectory("graft_gdin_").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_gdout_").toString
    base.toDF("vec_id", "embedding")
      .withColumn("label", org.apache.spark.sql.functions.lit("x"))
      .coalesce(1).write.mode("overwrite").parquet(s"$inDir/embeddings.parquet")
    GenData.generate(spark, inDir, outDir, factor = 200, tables = Some(Set("embeddings")))

    val rows = spark.read.parquet(s"$outDir/embeddings.parquet")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toVector).toMap
    assert(rows.size == 1000)

    def rot(v: Vector[Float], r: Int): Vector[Float] = {
      val k = r % dims; v.drop(k) ++ v.take(k)
    }
    // 1. pre-r11 scheme for r < 128: rotate, negate on wrap level 1
    for (r <- Seq(0, 1, 63, 64, 70, 127); (id, v) <- base) {
      val expected = rot(v.toVector, r).map(x => x * (1 - 2 * ((r / dims) % 2)))
      assert(rows(id + r * 1000000L) == expected, s"replica $r moved for vec $id")
    }
    // 2. intra-replica dots equal replica 0's exactly (float-cast-stable:
    // products compared as the doubles both engines would compute)
    def dot(a: Vector[Float], b: Vector[Float]): Double =
      a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    for (r <- Seq(128, 129, 150, 199)) {
      for (i <- base.indices; j <- i + 1 until base.size) {
        val d0 = dot(rows(i.toLong), rows(j.toLong))
        val dr = dot(rows(i + r * 1000000L), rows(j + r * 1000000L))
        assert(math.abs(d0 - dr) < 1e-6,
          s"replica $r distorted dot($i,$j): $d0 vs $dr")
      }
    }
    // 3. every PAIR among a base vector's 200 replicas stays under the
    // near-dup threshold (the old scheme had cos = 1.0 at r2 = r1 + 128;
    // pairwise, not just vs replica 0, because both sides of a collision
    // can be wrap levels ≥ 2)
    for ((id, _) <- base) {
      val copies = (0 until 200).map(r => rows(id + r * 1000000L))
      val worst = (for {
        i <- copies.indices; j <- i + 1 until copies.size
      } yield dot(copies(i), copies(j)) /
        (math.sqrt(dot(copies(i), copies(i))) * math.sqrt(dot(copies(j), copies(j))))).max
      assert(worst < 0.9, s"vec $id has a wrap near-dup: cos=$worst")
    }
  }
}
