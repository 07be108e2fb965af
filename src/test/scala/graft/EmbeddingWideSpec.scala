package graft

import graft.queries.Dedup
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the corpus-sized embedding near-dup configuration
  * (`dedup_embedding_cosine_w`): exact-duplicate vector groups collapse
  * before banding and always surface in the output, reported cosines are
  * exact (verified, never the LSH estimate), and the 16×16 centered
  * banding actually recalls planted near-duplicates at the 0.9
  * threshold. The driver oracle proves Spark↔DuckDB agreement; this spec
  * proves the AGREED result is the right one on a corpus with known
  * ground truth (the sf tables contain no true near-dup vectors, so
  * agreement alone would also pass on an operator that returned nothing).
  */
class EmbeddingWideSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val dims = 64

  private def normalize(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    v.map(_ / n)
  }

  // deterministic corpus: seeded base vectors, one 4-member identical
  // group, 20 planted near-dups at cosine ~0.99 (v + 0.15·noise).
  private lazy val corpus: Seq[(Long, Array[Double])] = {
    val rnd = new scala.util.Random(42)
    def vec(): Array[Double] = normalize(Array.fill(dims)(rnd.nextGaussian()))
    val base = (0 until 60).map(i => (i.toLong, vec()))
    val copies = Seq(100L, 101L, 102L).map(id => (id, base(0)._2))
    val nearDups = (1 to 20).map { i =>
      val noise = vec()
      val v = normalize(base(i)._2.zip(noise).map { case (a, b) => a + 0.15 * b })
      (200L + i, v)
    }
    base ++ copies ++ nearDups
  }

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_embwide_").toString
    import spark.implicits._
    corpus.map { case (id, v) => (id, v.map(_.toFloat), 0) }
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    // same fold order as the dot_product kernel: index order, init 0
    var s = 0.0
    var i = 0
    // float-cast first: the operator reads float32 parquet and widens
    val af = a.map(_.toFloat.toDouble); val bf = b.map(_.toFloat.toDouble)
    while (i < dims) { s += af(i) * bf(i); i += 1 }
    s
  }

  private lazy val bruteForce: Map[(Long, Long), Double] = {
    val pairs = for {
      (ia, va) <- corpus; (ib, vb) <- corpus if ia < ib
      c = cos(va, vb) if c >= 0.9
    } yield (ia, ib) -> c
    pairs.toMap
  }

  private lazy val result: Map[(Long, Long), Double] =
    Dedup.embeddingCosinePairsWide(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

  test("band width auto-sizes to the corpus; oracle tiers stay at the static 16") {
    // the sizing law: 2^bits ~ 8N, floored at 16 (every oracle-checked
    // corpus: sf0.01 = 500 vectors, sf0.1 audit = 2k) and capped at 30
    // (hyperplane_sig packs one band into an int)
    assert(Dedup.wideBandBits(500L) == 16)      // sf0.01 gate
    assert(Dedup.wideBandBits(2000L) == 16)     // sf0.1 audit
    assert(Dedup.wideBandBits(20000L) == 18)    // sf1
    assert(Dedup.wideBandBits(200000L) == 21)   // sf10
    assert(Dedup.wideBandBits(2000000L) == 24)  // sf100 — the disk-filler fixed
    assert(Dedup.wideBandBits(Long.MaxValue / 2) == 30)
    // and the default invocation at gate scale IS the explicit-16 plan:
    // identical result relation, so the static (16,16) oracle text the
    // census key commits to remains exact wherever the driver compares
    val explicit = Dedup.embeddingCosinePairsWide(spark, dir, bits = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
    val auto = result.toSeq.map { case ((a, b), c) => (a, b, c) }.sorted
    assert(explicit.toSeq == auto)
  }

  test("every reported pair is a true >=0.9 pair with the exact cosine") {
    assert(result.nonEmpty, "no pairs found at all")
    result.foreach { case (k, c) =>
      val truth = bruteForce.get(k)
      assert(truth.isDefined, s"false positive pair $k at cosine $c")
      assert(math.abs(truth.get - c) < 1e-9, s"cosine mismatch for $k: $c vs ${truth.get}")
    }
  }

  test("identical-vector groups collapse and still emit every member pair") {
    // group {0, 100, 101, 102}: all 6 pairs, cosine = dot(v,v) ~ 1
    val group = Seq(0L, 100L, 101L, 102L)
    for (a <- group; b <- group if a < b) {
      val c = result.get((a, b))
      assert(c.isDefined, s"identical pair ($a,$b) missing")
      assert(c.get > 0.999, s"identical pair ($a,$b) cosine ${c.get}")
    }
  }

  test("planted near-dups recall >= 0.75 at the default 16x16 banding") {
    // hyperplane-LSH math at cosine ~0.99: p(bit) ~ 0.955, band survival
    // p^16 ~ 0.48, 16 bands -> ~1.0 expected recall; the pin is loose
    // (0.75) so it fails on structural regressions (collapsed bands,
    // un-centered planes), not on hash luck for one pair.
    val planted = (1 to 20).map(i => (i.toLong, 200L + i))
    val found = planted.count(result.contains)
    info(s"planted near-dup recall: $found/20")
    assert(found >= 15, s"recall collapsed: $found/20 planted pairs found")
  }

  test("candidate exchanges never carry the vectors") {
    val p = Dedup.embeddingCosinePairsWide(spark, dir)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    val exchanges = """\(\d+\) Exchange\n(Input[^\n]*)\n(Arguments:[^\n]*)""".r
      .findAllMatchIn(p).map(m => (m.group(1), m.group(2))).toSeq
    assert(exchanges.nonEmpty, "no Exchange details found in formatted plan")
    val vecAttr = """\bv#\d+""".r
    exchanges.foreach { case (in, args) =>
      // vectors may ride only vec_id/rep-keyed exchanges (cache build,
      // verify joins, member expansion — cardinality = corpus); the
      // band/pair-keyed exchanges are the big ones and must stay compact.
      if (vecAttr.findFirstIn(in).isDefined)
        assert(!args.contains("band_") && !args.contains("id_a")
          && !args.contains("id_b"),
          s"vectors entered a candidate-side exchange: $in / $args")
    }
  }

  test("L2-normalized input contract: unnormalized exact duplicates are dropped") {
    // The verification predicate is the RAW dot product (== cosine only
    // at unit norm — the documented input contract, ADVICE r10). A pair
    // of identical vectors at norm 0.5 has dot = ||v||² = 0.25 < 0.9 and
    // must NOT surface; the same pair scaled to unit norm must.
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_embnorm_").toString
    val unit = normalize(Array.fill(dims)(1.0))
    val small = unit.map(_ * 0.5)
    Seq((0L, small.map(_.toFloat), 0), (1L, small.map(_.toFloat), 0),
      (10L, unit.map(_.toFloat), 0), (11L, unit.map(_.toFloat), 0))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val pairs = Dedup.embeddingCosinePairsWide(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!pairs.contains((0L, 1L)),
      "sub-unit-norm duplicates must be dropped by the raw-dot predicate")
    assert(pairs.contains((10L, 11L)), "unit-norm duplicates must surface")
  }
}
