package graft.queries

import graft.{Engine, QueryDef}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data deduplication operators over the `documents` table
  * (BASELINE.json north star — these are first-class alongside the
  * reference's own inventory).
  *
  * Scale design (100 TB): every signature (minhash/simhash/LSH) is
  * computed per-row with higher-order functions — no explode+shuffle of
  * raw shingles. The only shuffles are on compact keys: (band_idx,
  * band_signature) for candidate generation, then a hash-join back to
  * fetch token sets for exact verification of the (tiny) candidate set.
  * Candidate pairs scale with true-duplicate density, not corpus size².
  */
object Dedup {

  private def docs(spark: SparkSession, dir: String): Unit =
    Engine.table(spark, dir, "documents").createOrReplaceTempView("documents")

  /** Shared tokenization: whitespace split, empties dropped. */
  private val tokSql =
    "SELECT doc_id, filter(split(text, ' '), x -> x <> '') AS tokens FROM documents"

  /** Distinct word-3-gram shingles per doc. */
  private val shingleSql =
    s"""SELECT doc_id, array_distinct(transform(sequence(0, size(tokens)-3),
       |  i -> concat_ws(' ', tokens[i], tokens[i+1], tokens[i+2]))) AS shingles
       |FROM ($tokSql) WHERE size(tokens) >= 3""".stripMargin

  // --- exact dedup: hash-groupBy on the full text -------------------------
  val exact: QueryDef = QueryDef.sqlBacked(
    "dedup_exact",
    """SELECT min(doc_id) AS keeper_id, count(*) AS n_copies
      |FROM documents GROUP BY text ORDER BY keeper_id""".stripMargin
  ) { (spark, dir) =>
    docs(spark, dir)
    spark.sql(
      """SELECT min(doc_id) AS keeper_id, count(*) AS n_copies
        |FROM documents GROUP BY text ORDER BY keeper_id""".stripMargin)
  }

  /** Exact dedup, scale path: group on md5(text) instead of the full text
    * so the shuffle carries 16-byte keys, not document bodies. At 100 TB
    * this is the difference between shuffling the corpus and shuffling a
    * fingerprint column. */
  val exactHash: QueryDef = QueryDef.sqlBacked(
    "dedup_exact_hash",
    """SELECT md5(text) AS fp, min(doc_id) AS keeper_id, count(*) AS n_copies
      |FROM documents GROUP BY md5(text) ORDER BY keeper_id""".stripMargin
  ) { (spark, dir) =>
    docs(spark, dir)
    spark.sql(
      """SELECT md5(text) AS fp, min(doc_id) AS keeper_id, count(*) AS n_copies
        |FROM documents GROUP BY md5(text) ORDER BY keeper_id""".stripMargin)
  }

  // --- MinHash + LSH near-dup pairs ---------------------------------------
  // k=64 hashes (xxhash64 seeded by hash index), 16 bands × 4 rows,
  // candidates from band-bucket equality, verified with exact Jaccard.
  // xxhash64 is Spark-specific → rows-only oracle; properties are pinned
  // by DedupSpec instead.
  def minhashPairs(spark: SparkSession, dir: String, threshold: Double = 0.5): DataFrame = {
    docs(spark, dir)
    spark.sql(
      s"""WITH sh AS ($shingleSql),
         |sig AS (
         |  SELECT doc_id, shingles,
         |    transform(sequence(0, 63), s ->
         |      aggregate(shingles, 9223372036854775807L,
         |        (acc, x) -> least(acc, xxhash64(s, x)))) AS minhash
         |  FROM sh WHERE size(shingles) > 0
         |),
         |bands AS (
         |  SELECT doc_id, b AS band_idx,
         |    concat_ws(',', slice(minhash, b * 4 + 1, 4)) AS band_sig
         |  FROM sig LATERAL VIEW explode(sequence(0, 15)) t AS b
         |),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM bands a JOIN bands b
         |    ON a.band_idx = b.band_idx AND a.band_sig = b.band_sig
         |   AND a.doc_id < b.doc_id
         |)
         |SELECT c.id_a, c.id_b,
         |  CAST(size(array_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
         |    / size(array_union(sa.shingles, sb.shingles)) AS jaccard
         |FROM cand c
         |JOIN sh sa ON c.id_a = sa.doc_id
         |JOIN sh sb ON c.id_b = sb.doc_id
         |WHERE CAST(size(array_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
         |    / size(array_union(sa.shingles, sb.shingles)) >= $threshold
         |ORDER BY id_a, id_b""".stripMargin)
  }

  val minhash: QueryDef = QueryDef.rowsOnly("dedup_minhash_lsh")(minhashPairs(_, _))

  // --- SimHash near-dup pairs ---------------------------------------------
  // 64-bit simhash per doc (per-row lambda over tokens), banded into
  // 4 × 16-bit chunks for candidates, verified with hamming ≤ 3.
  def simhashPairs(spark: SparkSession, dir: String, maxHamming: Int = 3): DataFrame = {
    docs(spark, dir)
    spark.sql(
      s"""WITH tok AS ($tokSql),
         |fp AS (
         |  SELECT doc_id,
         |    aggregate(sequence(0, 63), 0L, (acc, j) -> acc +
         |      CASE WHEN aggregate(tokens, 0L, (a, t) -> a +
         |             CASE WHEN (shiftright(xxhash64(t), j) & 1) = 1 THEN 1 ELSE -1 END) >= 0
         |           THEN shiftleft(1L, j) ELSE 0L END) AS simhash
         |  FROM tok WHERE size(tokens) > 0
         |),
         |bands AS (
         |  SELECT doc_id, simhash, b AS band_idx,
         |    shiftright(simhash, b * 16) & 65535 AS band_val
         |  FROM fp LATERAL VIEW explode(sequence(0, 3)) t AS b
         |),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         |    a.simhash AS sh_a, b.simhash AS sh_b
         |  FROM bands a JOIN bands b
         |    ON a.band_idx = b.band_idx AND a.band_val = b.band_val
         |   AND a.doc_id < b.doc_id
         |)
         |SELECT id_a, id_b, bit_count(sh_a ^ sh_b) AS hamming
         |FROM cand WHERE bit_count(sh_a ^ sh_b) <= $maxHamming
         |ORDER BY id_a, id_b""".stripMargin)
  }

  val simhash: QueryDef = QueryDef.rowsOnly("dedup_simhash")(simhashPairs(_, _))

  // --- n-gram Jaccard via rare-shingle candidate join ---------------------
  // Pairs must share at least one "rare" shingle (doc-freq ≤ maxDf) —
  // the inverted-index trick that keeps the self-join from exploding on
  // stop-shingles at scale.
  def ngramJaccardPairs(spark: SparkSession, dir: String,
      threshold: Double = 0.4, maxDf: Int = 10): DataFrame = {
    docs(spark, dir)
    spark.sql(
      s"""WITH sh AS ($shingleSql),
         |inv AS (
         |  SELECT shingle, doc_id
         |  FROM sh LATERAL VIEW explode(shingles) t AS shingle
         |),
         |rare AS (
         |  SELECT shingle FROM inv GROUP BY shingle HAVING count(*) <= $maxDf
         |),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM inv a JOIN rare r ON a.shingle = r.shingle
         |             JOIN inv b ON a.shingle = b.shingle
         |  WHERE a.doc_id < b.doc_id
         |)
         |SELECT c.id_a, c.id_b,
         |  CAST(size(array_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
         |    / size(array_union(sa.shingles, sb.shingles)) AS jaccard
         |FROM cand c
         |JOIN sh sa ON c.id_a = sa.doc_id
         |JOIN sh sb ON c.id_b = sb.doc_id
         |WHERE CAST(size(array_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
         |    / size(array_union(sa.shingles, sb.shingles)) >= $threshold
         |ORDER BY id_a, id_b""".stripMargin)
  }

  val ngramJaccard: QueryDef = QueryDef.rowsOnly("dedup_ngram_jaccard")(ngramJaccardPairs(_, _))

  // --- embedding-cosine near-dup via random-hyperplane LSH ----------------
  // Embeddings are L2-normalized (TESTDATA) so dot = cosine. Hyperplane
  // components are derived deterministically from xxhash64(p, d); 16-bit
  // signatures banded 4×4 generate candidates, exact dot verifies.
  // The dot product folds in array-index order (deterministic doubles).
  // Default threshold is calibrated to the synthetic corpus (embeddings
  // are near-orthogonal; top-1 cosines sit around 0.3-0.5), so the
  // operator produces a non-trivial pair set end-to-end.
  def embeddingCosinePairs(spark: SparkSession, dir: String,
      threshold: Double = 0.3): DataFrame = {
    Engine.table(spark, dir, "embeddings").createOrReplaceTempView("embeddings")
    spark.sql(
      s"""WITH e AS (
         |  SELECT vec_id, transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings
         |),
         |sig AS (
         |  SELECT vec_id, v,
         |    aggregate(sequence(0, 15), 0, (acc, p) -> acc +
         |      CASE WHEN aggregate(sequence(0, size(v) - 1), CAST(0 AS DOUBLE),
         |             (s, d) -> s + v[d] * (CAST(xxhash64(p, d) % 1000 AS DOUBLE) / 1000.0)) >= 0
         |           THEN CAST(shiftleft(1, p) AS INT) ELSE 0 END) AS lsh
         |  FROM e
         |),
         |bands AS (
         |  SELECT vec_id, v, b AS band_idx, shiftright(lsh, b * 4) & 15 AS band_val
         |  FROM sig LATERAL VIEW explode(sequence(0, 3)) t AS b
         |),
         |cand AS (
         |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
         |    a.v AS va, b.v AS vb
         |  FROM bands a JOIN bands b
         |    ON a.band_idx = b.band_idx AND a.band_val = b.band_val
         |   AND a.vec_id < b.vec_id
         |)
         |SELECT id_a, id_b,
         |  aggregate(zip_with(va, vb, (x, y) -> x * y), CAST(0 AS DOUBLE),
         |    (acc, p) -> acc + p) AS cosine
         |FROM cand
         |WHERE aggregate(zip_with(va, vb, (x, y) -> x * y), CAST(0 AS DOUBLE),
         |    (acc, p) -> acc + p) >= $threshold
         |ORDER BY id_a, id_b""".stripMargin)
  }

  val embeddingCosine: QueryDef =
    QueryDef.rowsOnly("dedup_embedding_cosine")(embeddingCosinePairs(_, _))

  val all: Seq[QueryDef] =
    Seq(exact, exactHash, minhash, simhash, ngramJaccard, embeddingCosine)
}
