package graft

import graft.queries.Dedup
import org.scalatest.funsuite.AnyFunSuite

/** Adversarial pins for the r11 exact count bound (containment/ngram
  * candidate stage): `|∩| ≤ nshared + min(nsh−nrare)` may drop a pair
  * BEFORE verification only when the bound proves it sub-threshold. An
  * off-by-one (wrong min, > vs ≥, common/rare miscount) would silently
  * drop TRUE pairs — the sf0.01 gate might not notice if its corpus has
  * no tight pair, so these corpora are built to sit ON the edges:
  *   - containment ratios swept through the 0.5 threshold, including a
  *     pair at exactly 0.5 (must be kept — the predicate is ≥);
  *   - common (df > maxDf) shingles mixed INTO the intersection so the
  *     owned-common term of the bound is load-bearing, with rare bridges
  *     keeping the pairs inside the candidate policy's domain;
  * and the result is compared against brute-force all-pairs containment
  * computed in-test from the same shingle relation.
  *
  * The comparison also CHARACTERIZES the one designed gap: a pair whose
  * every shared shingle is common (df > maxDf) never enters the rare
  * posting index — that is the candidate policy's documented contract
  * (Dedup.scala), not a bound bug — so brute-force-minus-pipeline must
  * equal exactly the no-shared-rare pairs, nothing else.
  */
class CountBoundSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def corpus(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_cbound_").toString
    import spark.implicits._
    rows.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'test' AS source",
        "CAST(length(text) AS BIGINT) AS n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  /** Brute-force exact containment over the cached shingle relation the
    * pipeline itself built (same tokenization, same kernel). */
  private def bruteForce(threshold: Double = 0.5) =
    spark.sql(
      s"""SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  containment_stats(a.shingles, b.shingles)[0] AS c_ab,
         |  containment_stats(a.shingles, b.shingles)[1] AS c_ba
         |FROM dedup_sh a JOIN dedup_sh b ON a.doc_id < b.doc_id
         |WHERE containment_stats(a.shingles, b.shingles)[2] >= $threshold""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  /** Pairs outside the candidate policy's domain: no shared rare
    * (df ≤ maxDf) shingle. Computed from first principles on the raw
    * shingle relation, independent of the pipeline's index. */
  private def noSharedRare(maxDf: Int = 10): Set[(Long, Long)] = {
    val shared = spark.sql(
      s"""WITH inv AS (
         |  SELECT shingle, doc_id FROM dedup_sh
         |  LATERAL VIEW explode(shingles) t AS shingle
         |),
         |rare AS (
         |  SELECT shingle FROM inv GROUP BY shingle HAVING count(*) <= $maxDf
         |)
         |SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |FROM inv a JOIN rare r ON a.shingle = r.shingle
         |           JOIN inv b ON a.shingle = b.shingle
         |WHERE a.doc_id < b.doc_id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    bruteForce().filterNot(shared.contains)
  }

  private def w(i: Int, tag: String) = s"$tag$i"

  test("containment pairs match brute force through the 0.5 boundary") {
    // Pair family i: A_i = 20 unique words (18 rare shingles);
    // B_i = first k words of A_i + 12 fresh words. Containment of the
    // shared prefix sweeps (k−2)/min(18, k+10) through the threshold —
    // k=11 lands EXACTLY at 9/18 = 0.5, the ≥-edge the bound must keep.
    val rows = (4 to 16).flatMap { k =>
      val i = k.toLong
      val aWords = (0 until 20).map(j => w(j, s"a${i}_"))
      val bWords = aWords.take(k) ++ (0 until 12).map(j => w(j, s"b${i}_"))
      Seq((i * 2, aWords.mkString(" ")), (i * 2 + 1, bWords.mkString(" ")))
    }
    val dir = corpus(rows)
    val got = Dedup.containmentPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = bruteForce()
    assert(got == want, s"pipeline=$got brute=$want")
    // sanity: the sweep actually produced pairs on both sides of the
    // threshold, including the exact-0.5 edge (k=11 → ids 22,23)
    assert(want.contains((22L, 23L)), "the exactly-at-threshold pair is missing")
    assert(want.nonEmpty && want.size < rows.size * (rows.size - 1) / 2)
  }

  test("common shingles in the intersection: the owned-common term is exact") {
    // 12 filler docs repeat sentence S so S's shingles go common
    // (df ≥ 13 > maxDf). Each test pair shares a unique 3-word rare
    // bridge + S: the intersection mixes 2 rare bridge shingles with
    // S-side commons, so the bound's min(owned-common) term decides
    // admission. Fillers are mutually unrelated (unique prefixes).
    val s6 = (0 until 6).map(j => w(j, "s")).mkString(" ")
    val fillers = (0 until 12).map { f =>
      (900L + f, ((0 until 10).map(j => w(j, s"f${f}_")) :+ s6).mkString(" "))
    }
    val pairs = (0 until 5).flatMap { i =>
      val bridge = (0 until 3).map(j => w(j, s"p${i}_")).mkString(" ")
      val aTail = (0 until 6).map(j => w(j, s"x${i}_")).mkString(" ")
      val bTail = (0 until 14).map(j => w(j, s"y${i}_")).mkString(" ")
      Seq((i * 2L, s"$bridge $s6 $aTail"), (i * 2L + 1, s"$bridge $s6 $bTail"))
    }
    val dir = corpus(fillers ++ pairs)
    val got = Dedup.containmentPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = bruteForce()
    // every true pair here shares its rare bridge shingles, so the
    // candidate policy cannot be the reason for any difference — only a
    // bound bug could make these sets differ
    val bridged = want.filter { case (a, b) => a < 900 && b < 900 }
    assert(got.filter { case (a, b) => a < 900 && b < 900 } == bridged,
      s"bridged pairs diverged: got=$got want=$want")
    assert(bridged.size == 5, s"expected the 5 bridge pairs: $bridged")
  }

  test("the admission gap is exactly the no-shared-rare pairs") {
    // 12 fillers make "s1..s6 t1..t6" shingles common INCLUDING the
    // junction; P owns zero rare shingles, each filler owns one. P is
    // fully contained in every filler (containment 1.0) yet shares only
    // common shingles — the documented candidate-policy gap. The pipeline
    // must (a) miss exactly those pairs, (b) find everything else.
    val base = ((0 until 6).map(j => w(j, "s")) ++ (0 until 6).map(j => w(j, "t"))).mkString(" ")
    val fillers = (0 until 12).map(f => (100L + f, s"$base ${w(f, "u")}"))
    val plain = Seq((50L, base))
    val dir = corpus(fillers ++ plain)
    val got = Dedup.containmentPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = bruteForce()
    val gap = noSharedRare()
    assert(want.diff(got) == gap,
      s"pipeline misses ≠ no-shared-rare set: missed=${want.diff(got)} gap=$gap")
    assert(got.subsetOf(want), s"false positives: ${got.diff(want)}")
    // the gap is non-empty here by construction (P ⊂ every filler)
    assert(gap.exists { case (a, b) => a == 50L || b == 50L },
      "corpus failed to produce the intended no-shared-rare pairs")
  }
}
