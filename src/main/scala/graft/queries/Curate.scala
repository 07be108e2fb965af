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
  * MinHash candidates make the output engine-specific → rows-only check;
  * CurateSpec pins the invariants instead.
  */
object Curate {

  def curatedCorpus(spark: SparkSession, dir: String): DataFrame = {
    Engine.table(spark, dir, "documents").createOrReplaceTempView("documents")

    // per-row analysis (reuses TextAnalysis rule shapes)
    val scored = spark.sql(
      """SELECT doc_id, lang, text,
        |  size(regexp_extract_all(text, '\\S+', 0)) AS n_tokens,
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
        round(col("stopword_ratio"), 6).as("stopword_ratio"),
        round(col("distinct_ratio"), 6).as("distinct_ratio"))
      .orderBy(col("doc_id"))
  }

  val curate: QueryDef = QueryDef.rowsOnly("pipeline_curate")(curatedCorpus(_, _))

  val all: Seq[QueryDef] = Seq(curate)
}
