package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator/query: a Spark implementation plus (where the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle query.
  *
  * Determinism contract (so the driver's hash compare is stable):
  *   - aggregates over double columns are computed in exact DECIMAL (sums
  *     are order-independent) and the result cast to a pinned type that
  *     both engines produce;
  *   - every query output carries a deterministic total order;
  *   - column names are aliased identically on both sides.
  */
final case class QueryDef(
    name: String,
    oracle: Option[String])(
    val run: (SparkSession, String) => DataFrame)

object QueryDef {
  def sqlBacked(name: String, oracle: String)(run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, Some(oracle))(run)

  /** Ops whose semantics DuckDB can't mirror (engine-specific hashing,
    * ML-ish pipelines) — driver records a rows-only check. */
  def rowsOnly(name: String)(run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, None)(run)
}
