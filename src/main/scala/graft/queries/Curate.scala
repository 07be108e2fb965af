package graft.queries

import graft.{Engine, QueryDef}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end training-data curation pipeline — the composition proof
  * that the individual operators (language ID, quality scoring, token
  * counting, near-dup removal) chain as DataFrame→DataFrame transforms
  * into one curated corpus, the way a 100 TB preprocessing job would run:
  *
  *   documents
  *     → per-row scoring (one codegen span, no shuffle)
  *     → quality + language filter (pushed predicates)
  *     → anti-join against MinHash-LSH near-dup pairs (drops the
  *       higher-doc_id member of every detected pair)
  *     → curated corpus + stats.
  *
  * The DuckDB oracle recomputes the same pipeline with the near-dup set
  * expanded to the EXACT all-pairs Jaccard ≥ 0.8 relation — valid because
  * the LSH candidate set provably covers every Jaccard ≥ 0.5 pair on this
  * corpus (see Dedup.minhash's oracle), and 0.8-pairs ⊆ 0.5-pairs.
  */
object Curate {

  def curatedCorpus(spark: SparkSession, dir: String): DataFrame = {
    Engine.table(spark, dir, "documents").createOrReplaceTempView("documents")

    // per-row analysis (reuses TextAnalysis rule shapes; raw IEEE ratios,
    // no rounding — round() tie behavior is not engine-portable)
    val scored = spark.sql(
      """SELECT doc_id, lang, text,
        |  CAST(size(regexp_extract_all(text, '\\S+', 0)) AS INT) AS n_tokens,
        |  CAST(size(regexp_extract_all(lower(text), '\\b(the|a|and|of|to|in|is)\\b', 0)) AS DOUBLE)
        |    / size(regexp_extract_all(text, '\\S+', 0)) AS stopword_ratio,
        |  CAST(size(array_distinct(regexp_extract_all(lower(text), '[a-z]+', 0))) AS DOUBLE)
        |    / size(regexp_extract_all(lower(text), '[a-z]+', 0)) AS distinct_ratio
        |FROM documents""".stripMargin)

    val filtered = scored.filter(
      col("n_tokens") >= 5 && col("distinct_ratio") >= 0.2)

    // near-dup pairs from the LSH path; keep the lower doc_id of each pair
    val dupLosers = Dedup.minhashPairs(spark, dir, threshold = 0.8)
      .select(col("id_b").as("doc_id")).distinct()

    filtered
      .join(dupLosers, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        col("stopword_ratio"), col("distinct_ratio"))
      .orderBy(col("doc_id"))
  }

  private val curateOracle =
    s"""WITH scored AS (
       |  SELECT doc_id, lang,
       |    CAST(len(regexp_extract_all(text, '\\S+')) AS INT) AS n_tokens,
       |    CAST(len(regexp_extract_all(lower(text), '\\b(the|a|and|of|to|in|is)\\b')) AS DOUBLE)
       |      / len(regexp_extract_all(text, '\\S+')) AS stopword_ratio,
       |    CAST(len(list_distinct(regexp_extract_all(lower(text), '[a-z]+'))) AS DOUBLE)
       |      / len(regexp_extract_all(lower(text), '[a-z]+')) AS distinct_ratio
       |  FROM documents
       |),
       |sh AS (${Dedup.shingleDuckSql}),
       |dup_losers AS (
       |  SELECT DISTINCT b.doc_id AS doc_id
       |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
       |  WHERE ${Dedup.jaccardDuckSql("a.shingles", "b.shingles")} >= 0.8
       |)
       |SELECT doc_id, lang, n_tokens, stopword_ratio, distinct_ratio
       |FROM scored
       |WHERE n_tokens >= 5 AND distinct_ratio >= 0.2
       |  AND doc_id NOT IN (SELECT doc_id FROM dup_losers)
       |ORDER BY doc_id""".stripMargin

  val curate: QueryDef = QueryDef.sqlBacked("pipeline_curate", curateOracle)(curatedCorpus(_, _))

  // --- deterministic stratified sampling ----------------------------------
  // Training-data downsampling the way a 100 TB job has to do it: a
  // per-row hash-Bernoulli decision, NOT rand() (not reproducible, breaks
  // retries/speculation) and NOT reservoir/exact-count (needs a global
  // pass). Stratum = document length class; each stratum keeps its own
  // per-mille rate via `portable_hash(doc_id) % 1000 < rate`. Shuffle-free
  // scan+filter — the plan scales at I/O speed, the sample is stable
  // across runs/engines, and the rate per stratum is exact in expectation
  // with variance O(1/√n). The DuckDB oracle replays the identical hash
  // arithmetic, so the sampled id set matches row for row.
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    Engine.table(spark, dir, "documents").createOrReplaceTempView("documents")
    spark.sql(
      s"""SELECT doc_id, bucket FROM (
         |  SELECT doc_id,
         |    CASE WHEN length(text) < 200 THEN 'short'
         |         WHEN length(text) < 1000 THEN 'medium'
         |         ELSE 'long' END AS bucket,
         |    ${Dedup.hash60SparkSql("CAST(doc_id AS STRING)")} % 1000 AS h
         |  FROM documents) t
         |WHERE (bucket = 'short' AND h < 100)
         |   OR (bucket = 'medium' AND h < 500)
         |   OR bucket = 'long'
         |ORDER BY doc_id""".stripMargin)
  }

  private val sampleOracle =
    s"""SELECT doc_id, bucket FROM (
       |  SELECT doc_id,
       |    CASE WHEN length(text) < 200 THEN 'short'
       |         WHEN length(text) < 1000 THEN 'medium'
       |         ELSE 'long' END AS bucket,
       |    ${Dedup.hash60DuckSql("CAST(doc_id AS VARCHAR)")} % 1000 AS h
       |  FROM documents) t
       |WHERE (bucket = 'short' AND h < 100)
       |   OR (bucket = 'medium' AND h < 500)
       |   OR bucket = 'long'
       |ORDER BY doc_id""".stripMargin

  val sample: QueryDef =
    QueryDef.sqlBacked("pipeline_sample", sampleOracle)(stratifiedSample(_, _))

  val all: Seq[QueryDef] = Seq(curate, sample)
}
