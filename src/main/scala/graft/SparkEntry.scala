package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Analytic, Classify, Curate, Dedup, Events, Functions, Ivm, Layout, Multimodal, Relational, Similarity, TextAnalysis, Tpch}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every implemented operator's [[QueryDef]] from the query
  * modules; each def carries the Spark implementation and (where
  * expressible) the DuckDB oracle SQL.
  */
object SparkEntry {

  val allDefs: Seq[QueryDef] =
    Tpch.all ++ Relational.all ++ Functions.all ++ Analytic.all ++
      Dedup.all ++ TextAnalysis.all ++ Similarity.all ++ Multimodal.all ++
      Events.all ++ Ivm.all ++ Curate.all ++ Classify.all ++ Layout.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Tpch.q1.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(d => d.oracle.map(d.name -> _)).toMap

  /** Keys whose gate-tier emptiness is a documented semantic contract —
    * every other key returning 0 rows is a vacuous oracle comparison
    * (Verify warns; SparkEntrySpec pins this set). */
  def emptinessContracts: Set[String] =
    allDefs.filter(_.emptyOk).map(_.name).toSet
}
