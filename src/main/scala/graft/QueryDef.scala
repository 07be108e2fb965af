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
    oracle: Option[String],
    emptyOk: Boolean = false)(
    val run: (SparkSession, String) => DataFrame)

object QueryDef {
  def sqlBacked(name: String, oracle: String)(run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, Some(oracle))(run)

  /** A key whose EMPTINESS at the gate tiers is the semantic point (a
    * documented contract, e.g. an EXCEPT that proves containment or a
    * zero-idf suppression clause). Every other key returning 0 rows is a
    * vacuous oracle comparison — Verify flags it loudly, and
    * SparkEntrySpec pins this allowlist (VERDICT r12 #1: the
    * 0-rows-vs-0-rows class appeared twice — dedup_embedding_cosine_w,
    * ta_bm25* — before this guard existed). */
  def sqlBackedEmptyOk(name: String, oracle: String)(run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, Some(oracle), emptyOk = true)(run)

  /** Ops whose semantics DuckDB can't mirror (engine-specific hashing,
    * ML-ish pipelines) — driver records a rows-only check. */
  def rowsOnly(name: String)(run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, None)(run)
}
