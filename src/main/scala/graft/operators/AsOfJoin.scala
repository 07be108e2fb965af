package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic as-of join: each left row is enriched with the payload of the
  * most recent right row at-or-before its timestamp, per key — the
  * operator behind `evt_asof_join`, factored as a reusable
  * DataFrame → DataFrame combinator.
  *
  * Spark has no ASOF JOIN; the scalable composition is UNION both sides
  * and make ONE window pass: a single shuffle on the key columns,
  * O(|left| + |right|) window state, and no range self-join — candidates
  * per key never multiply the way a time-band join's do. At 100 TB this
  * is the difference between one exchange and an exploding inequality
  * join (see SCALE.md "Time series").
  *
  * Tie semantics: a right row AT the left row's timestamp matches
  * (inclusive as-of); among right rows sharing a timestamp the one
  * greatest under `rightTieBreak` wins (pass a unique id for
  * determinism). Left rows with no prior right row get NULL payload —
  * the LEFT OUTER flavor, matching every engine's ASOF default.
  *
  * Column contract: the result is `left.*` plus the right side's payload
  * columns (everything except `keys` and `rightTime`), which must not
  * collide with left column names — pre-rename the right side.
  */
object AsOfJoin {

  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      rightTieBreak: Seq[String] = Nil): DataFrame = {
    val payloadCols = right.columns.filterNot(c => keys.contains(c) || c == rightTime).toIndexedSeq
    require(payloadCols.nonEmpty, "right side has no payload columns")
    val collisions = payloadCols.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty, s"rename right payload columns colliding with left: $collisions")
    val reserved = Set("__t", "__side", "__l", "__p", "__pf")
    require(!(left.columns ++ right.columns).exists(reserved),
      s"column names ${reserved.mkString(", ")} are reserved by asOf")
    require(rightTieBreak.forall(c => payloadCols.contains(c)),
      "rightTieBreak columns must be right-side payload columns")

    val leftStruct = struct(left.columns.toIndexedSeq.map(col): _*)
    val payloadStruct = struct(payloadCols.map(col): _*)
    val leftStructType = left.select(leftStruct).schema.head.dataType
    val payloadType = right.select(payloadStruct).schema.head.dataType

    // Right rows sort BEFORE left rows at an equal timestamp (__side 0 <
    // 1), so the inclusive as-of sees them; the tie-break columns order
    // same-timestamp right rows, last (greatest) one winning the fill.
    val l = left.select(
      keys.map(col) ++ Seq(
        col(leftTime).as("__t"), lit(1).as("__side"),
        leftStruct.as("__l"), lit(null).cast(payloadType).as("__p")) ++
        rightTieBreak.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val r = right.select(
      keys.map(col) ++ Seq(
        col(rightTime).as("__t"), lit(0).as("__side"),
        lit(null).cast(leftStructType).as("__l"), payloadStruct.as("__p")) ++
        rightTieBreak.map(col): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((col("__t").asc +: col("__side").asc +: rightTieBreak.map(col(_).asc)): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r)
      .withColumn("__pf", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__l").isNotNull)
      .select(col("__l.*") +: payloadCols.map(c => col(s"__pf.$c").as(c)): _*)
  }
}
