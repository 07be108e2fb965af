package graft

import graft.queries.Dedup
import org.scalatest.funsuite.AnyFunSuite

/** Adversarial pins for the ngram-Jaccard candidate stage — the twin of
  * [[CountBoundSpec]] for the symmetric metric. The r11 count bound here
  * is `|∩| ≤ nshared + min(nsh−nrare)` against `t·greatest(nsh)` (the
  * |∪| lower bound), and the admission rule is ≥2 shared rare shingles
  * with a <2-owned fallback. An off-by-one (greatest vs least, > vs ≥,
  * miscounted commons) would silently drop TRUE pairs that the sf0.01
  * gate's corpus might not exercise, so these corpora sit ON the edges:
  *   - Jaccard swept through the 0.4 threshold with one pair at EXACTLY
  *     0.4 (8 shared shingles, union 20 — the quotient is the same
  *     double as the literal, and the predicate is ≥, so it must stay);
  *   - common (df > maxDf) shingles carrying most of the intersection,
  *     so the bound's owned-common term — not the rare count — is what
  *     admits the pair;
  * compared against brute-force all-pairs `jaccard_sorted` over the
  * pipeline's own cached shingle relation, restricted to the admission
  * rule's declared domain (computed from first principles in-test).
  * The third corpus characterizes the documented gap exactly: true
  * pairs sharing NO rare shingle never enter the index, and nothing
  * else may go missing.
  */
class JaccardBoundSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def corpus(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_jbound_").toString
    import spark.implicits._
    rows.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'test' AS source",
        "CAST(length(text) AS BIGINT) AS n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  /** Brute-force exact Jaccard over the per-copy cached shingle relation
    * (the ngram path indexes every copy — no rep collapse). */
  private def bruteForce(threshold: Double = 0.4): Set[(Long, Long)] =
    spark.sql(
      s"""SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |FROM dedup_sh a JOIN dedup_sh b ON a.doc_id < b.doc_id
         |WHERE jaccard_sorted(a.shingles, b.shingles) >= $threshold""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  /** The admission rule's declared domain, from first principles on the
    * raw shingle relation: pairs sharing ≥2 rare (df ≤ maxDf) shingles,
    * or ≥1 when either side OWNS <2 rare shingles. */
  private def admitted(maxDf: Int = 10): Set[(Long, Long)] = {
    spark.sql(
      s"""WITH inv AS (
         |  SELECT shingle, doc_id FROM dedup_sh
         |  LATERAL VIEW explode(shingles) t AS shingle
         |),
         |rinv AS (
         |  SELECT shingle, doc_id,
         |    count(*) OVER (PARTITION BY doc_id) AS nrare
         |  FROM (
         |    SELECT shingle, doc_id,
         |      count(*) OVER (PARTITION BY shingle) AS df
         |    FROM inv) d
         |  WHERE df <= $maxDf
         |)
         |SELECT id_a, id_b FROM (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS nshared,
         |    min(a.nrare) AS nrare_a, min(b.nrare) AS nrare_b
         |  FROM rinv a JOIN rinv b ON a.shingle = b.shingle
         |  WHERE a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id) g
         |WHERE nshared >= 2 OR nrare_a < 2 OR nrare_b < 2""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  private def run(dir: String): Set[(Long, Long)] =
    Dedup.ngramJaccardPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private def w(i: Int, tag: String) = s"$tag$i"

  test("jaccard pairs match brute force through the 0.4 boundary") {
    // Family i: A = 10-word shared prefix + 6 own words, B = same prefix
    // + (m+n−6) own words with m+n swept. Shared shingles = 8 (3-grams
    // inside the prefix); J = 8 / (|A|+|B|−8) crosses 0.4 as the suffix
    // budget grows — m+n=12 (6/6) lands at 8/20 = EXACTLY 0.4. All
    // shingles are family-unique (df = 2 ≤ 10), so every true pair is
    // inside the admission domain and only a bound bug could drop one.
    val rows = (8 to 20 by 2).flatMap { mn =>
      val i = mn.toLong
      val prefix = (0 until 10).map(j => w(j, s"p${i}_"))
      val a = prefix ++ (0 until 6).map(j => w(j, s"a${i}_"))
      val b = prefix ++ (0 until (mn - 6)).map(j => w(j, s"b${i}_"))
      Seq((i * 2, a.mkString(" ")), (i * 2 + 1, b.mkString(" ")))
    }
    val dir = corpus(rows)
    val got = run(dir)
    val want = bruteForce()
    assert(got == want, s"pipeline=$got brute=$want")
    // mn=12 → ids (24, 25): union 20, intersection 8, J exactly 0.4
    assert(want.contains((24L, 25L)), "the exactly-at-threshold pair is missing")
    // the sweep produced pairs on both sides of the threshold
    assert(want.nonEmpty && want.size < rows.size / 2)
  }

  test("common shingles carry the intersection: the owned-common term admits") {
    // 12 fillers make the 6-word block S common (df ≥ 13 > maxDf); each
    // test pair is bridge(4 unique words) + S + own tail, so of its 8
    // shared shingles only the 4 touching the bridge are rare — J ≥ 0.4
    // holds only because the 4 pure-S COMMON shingles count into |∩|,
    // which is exactly what the bound's owned-common term must price.
    // Filler-filler J = 4/20 = 0.2 stays under threshold by design.
    val s6 = (0 until 6).map(j => w(j, "s")).mkString(" ")
    val fillers = (0 until 12).map { f =>
      (900L + f, ((0 until 10).map(j => w(j, s"f${f}_")) :+ s6).mkString(" "))
    }
    val pairs = (0 until 5).flatMap { i =>
      val bridge = (0 until 4).map(j => w(j, s"p${i}_")).mkString(" ")
      val aTail = (0 until 2).map(j => w(j, s"x${i}_")).mkString(" ")
      val bTail = (0 until 4).map(j => w(j, s"y${i}_")).mkString(" ")
      Seq((i * 2L, s"$bridge $s6 $aTail"), (i * 2L + 1, s"$bridge $s6 $bTail"))
    }
    val dir = corpus(fillers ++ pairs)
    val got = run(dir)
    val want = bruteForce()
    val bridged = want.filter { case (a, b) => a < 900 && b < 900 }
    assert(bridged.size == 5, s"expected the 5 bridge pairs above 0.4: $want")
    assert(got.filter { case (a, b) => a < 900 && b < 900 } == bridged,
      s"bridged pairs diverged: got=$got want=$want")
  }

  test("the admission gap is exactly the no-shared-rare pairs") {
    // 12 fillers repeat the 12-token base so ALL its shingles go common
    // (df ≥ 13), each filler adding one unique suffix word (1 rare
    // boundary shingle). P is the bare base: nrare(P) = 0 and every
    // P↔filler / filler↔filler pair has J ≥ 0.4 while sharing ZERO rare
    // shingles — the documented candidate-policy gap. The pipeline must
    // miss exactly the outside-domain pairs and nothing else.
    val base = ((0 until 6).map(j => w(j, "s")) ++
      (0 until 6).map(j => w(j, "t"))).mkString(" ")
    val fillers = (0 until 12).map(f => (100L + f, s"$base ${w(f, "u")}"))
    val dir = corpus(fillers :+ (50L, base))
    val got = run(dir)
    val want = bruteForce()
    val dom = admitted()
    assert(got == want.intersect(dom),
      s"missed ≠ outside-domain: got=$got want=$want admitted=$dom")
    assert(got.subsetOf(want), s"false positives: ${got.diff(want)}")
    // the gap is non-empty here by construction
    assert(want.diff(dom).exists { case (a, b) => a == 50L || b == 50L },
      "corpus failed to produce the intended no-shared-rare pairs")
  }
}
