package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Post-normalization schema contract for the driver-provided tables.
  *
  * Round 8 lost 14 correctness keys and 26 tests to a silent testdata
  * drift (`events.ts` changed physical encoding between rounds) that
  * surfaced as an `AnalysisException` deep inside every consumer. This
  * guard makes the NEXT drift fail in one line at the first `Engine.table`
  * read, naming the table, the column, and found-vs-expected — instead of
  * 26 tests deep with a cryptic cast error (VERDICT r8 ask #2).
  *
  * The pinned types are LOGICAL (post-normalization): whatever the files'
  * physical encoding, [[Engine.table]] must present `events.ts` as
  * TIMESTAMP_NTZ and every other column as listed here. Nullability is
  * deliberately ignored — it carries no semantics for these read-only
  * inputs and flips freely between writer versions.
  */
object SchemaGuard {

  /** Canonical one-word spelling per logical type; nullability erased. */
  private def canon(dt: DataType): String = dt match {
    case IntegerType         => "int"
    case LongType            => "long"
    case FloatType           => "float"
    case DoubleType          => "double"
    case StringType          => "string"
    case BinaryType          => "binary"
    case DateType            => "date"
    case TimestampNTZType    => "timestamp_ntz"
    case TimestampType       => "timestamp_ltz"
    case ArrayType(e, _)     => s"array<${canon(e)}>"
    case other               => other.simpleString
  }

  /** Expected (column, type) list per driver table, in file order. */
  private val expected: Map[String, Seq[(String, String)]] = Map(
    "region" -> Seq("r_regionkey" -> "int", "r_name" -> "string"),
    "nation" -> Seq(
      "n_nationkey" -> "int", "n_name" -> "string", "n_regionkey" -> "int"),
    "customer" -> Seq(
      "c_custkey" -> "long", "c_name" -> "string", "c_nationkey" -> "int",
      "c_acctbal" -> "double", "c_mktsegment" -> "string"),
    "supplier" -> Seq(
      "s_suppkey" -> "long", "s_name" -> "string", "s_nationkey" -> "int",
      "s_acctbal" -> "double"),
    "part" -> Seq(
      "p_partkey" -> "long", "p_name" -> "string", "p_brand" -> "string",
      "p_type" -> "string", "p_size" -> "int", "p_retailprice" -> "double"),
    "orders" -> Seq(
      "o_orderkey" -> "long", "o_custkey" -> "long",
      "o_orderstatus" -> "string", "o_totalprice" -> "double",
      "o_orderdate" -> "timestamp_ntz", "o_orderpriority" -> "string"),
    "lineitem" -> Seq(
      "l_orderkey" -> "long", "l_partkey" -> "long", "l_suppkey" -> "long",
      "l_linenumber" -> "int", "l_quantity" -> "double",
      "l_extendedprice" -> "double", "l_discount" -> "double",
      "l_tax" -> "double", "l_returnflag" -> "string",
      "l_linestatus" -> "string", "l_shipdate" -> "timestamp_ntz"),
    "events" -> Seq(
      "event_id" -> "long", "ts" -> "timestamp_ntz", "user_id" -> "long",
      "event_type" -> "string", "value" -> "double", "props" -> "string"),
    "documents" -> Seq(
      "doc_id" -> "long", "text" -> "string", "lang" -> "string",
      "source" -> "string", "n_chars" -> "long"),
    "embeddings" -> Seq(
      "vec_id" -> "long", "embedding" -> "array<float>", "label" -> "int")
  )

  /** Throws with a one-line diagnosis if `df`'s schema drifts from the pin.
    * Tables not in the map (none today) pass through unchecked. */
  def check(name: String, df: DataFrame): Unit =
    expected.get(name).foreach { exp =>
      val got = df.schema.fields.toSeq.map(f => f.name -> canon(f.dataType))
      if (got != exp) {
        val mismatches = exp.zipAll(got, "<missing>" -> "", "<missing>" -> "")
          .collect { case ((en, et), (gn, gt)) if (en, et) != (gn, gt) =>
            s"column $en: expected $et, found ${if (gn == en) gt else s"$gn $gt"}"
          }
        throw new IllegalStateException(
          s"SchemaGuard: table '$name' drifted from the pinned logical schema — " +
            mismatches.mkString("; ") +
            ". If the driver regenerated testdata with a new encoding, adapt " +
            "Engine.table's normalization (NOT the consumers) and re-pin here.")
      }
    }
}
