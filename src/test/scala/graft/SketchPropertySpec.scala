package graft

import org.scalatest.funsuite.AnyFunSuite

/** Property-style pins for the sketch kernels over seeded random inputs:
  * the generated-code results must equal a plain Scala re-computation on
  * arbitrary arrays, and the sketches must satisfy the algebraic
  * properties that make them usable distributed — MinHash lanes merge by
  * elementwise min (partial sketches combine associatively), and both
  * sketches are insensitive to duplicate elements.
  */
class SketchPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(42)
  private val cases: Seq[Seq[Long]] =
    Seq.tabulate(50)(i => Seq.fill(1 + rnd.nextInt(40))(rnd.nextLong())) :+ Seq(0L)

  private def refSimhash(hs: Seq[Long]): Long = {
    var fp = 0L
    for (j <- 0 until 60) {
      val votes = hs.map(h => if (((h >>> j) & 1L) == 1L) 1 else -1).sum
      if (votes >= 0) fp |= (1L << j)
    }
    fp
  }

  private def refMinhash(hs: Seq[Long]): Seq[Long] =
    (0 until 64).map { k =>
      val mul = (2L * k + 1L) * 0x9E3779B97F4A7C15L
      val inc = k * 0xBF58476D1CE4E5B9L
      if (hs.isEmpty) Long.MaxValue else hs.map(h => h * mul + inc).min
    }

  test("kernels match the reference computation on 50 seeded random arrays") {
    val got = cases.zipWithIndex.map { case (hs, i) => (i, hs) }
      .toDF("i", "hs")
      .selectExpr("i", "simhash60(hs) AS sh", "minhash64(hs) AS mh")
      .collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getSeq[Long](2)))
      .toMap
    cases.zipWithIndex.foreach { case (hs, i) =>
      assert(got(i)._1 == refSimhash(hs), s"simhash case $i")
      assert(got(i)._2 == refMinhash(hs), s"minhash case $i")
    }
  }

  test("minhash lanes merge by elementwise min (distributed combinability)") {
    val (a, b) = (cases(0), cases(1))
    val rows = Seq(("a", a), ("b", b), ("ab", a ++ b)).toDF("k", "hs")
      .selectExpr("k", "minhash64(hs) AS mh").collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val merged = rows("a").zip(rows("b")).map { case (x, y) => math.min(x, y) }
    assert(rows("ab") == merged.toSeq)
  }

  test("minhash is insensitive to element order (cached-sorted-array reuse)") {
    // minhashCandSql feeds minhash64 the cached SORTED hshingles array
    // instead of re-hashing shingles inline; per-lane minima must
    // therefore ignore ordering, or the candidate sets would diverge
    val a = cases(3)
    val rows = Seq(("orig", a), ("sorted", a.sorted), ("rev", a.sorted.reverse))
      .toDF("k", "hs")
      .selectExpr("k", "minhash64(hs) AS mh").collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(rows("orig") == rows("sorted") && rows("orig") == rows("rev"))
  }

  test("sketches are insensitive to duplicate elements") {
    val a = cases(2)
    val rows = Seq(("once", a), ("dup", a ++ a ++ a)).toDF("k", "hs")
      .selectExpr("k", "simhash60(hs) AS sh", "minhash64(hs) AS mh").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getSeq[Long](2))).toMap
    // minhash: min over a multiset ignores multiplicity
    assert(rows("once")._2 == rows("dup")._2)
    // simhash: tripling every vote cannot flip any bit's sign
    assert(rows("once")._1 == rows("dup")._1)
  }
}
