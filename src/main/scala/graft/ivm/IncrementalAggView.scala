package graft.ivm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Incremental materialized aggregate view — the capability the reference
  * was built toward but never finished (SURVEY.md §1.1/§2.5: every tuple
  * carries an i64 frequency; aggregates declare supports_retract; the
  * storage layer merges freq deltas — /root/reference/src/storage/src/
  * storage.rs:34-63, functions/src/lib.rs:117-159 — yet no incremental
  * executor exists).
  *
  * Spark-native realization:
  *   - a change stream is a DataFrame with a `__freq: Long` column
  *     (+n insert, −n retract), exactly the reference's tuple model;
  *   - view state is the *partial aggregate* per key (count as Σfreq,
  *     sums as Σ value×freq) persisted as versioned parquet snapshots;
  *   - refresh = union(state-partials, delta-partials) → one hash
  *     aggregation on the view key → new snapshot. Groups whose count
  *     reaches zero vanish, i.e. full retraction semantics;
  *   - finalized values (avg = sum/count) are derived on read, so state
  *     stays mergeable — the same initialize/apply/merge/finalize split
  *     as the reference's AggregateFunction trait.
  *
  * Scale: the refresh shuffles only |state ∪ delta-partials| rows keyed
  * by the view key — independent of base-table size. With the state
  * bucketed by key on a real cluster the merge is co-partitioned and the
  * exchange disappears; at 100 TB the delta is the only new I/O.
  */
final class IncrementalAggView(
    spark: SparkSession,
    keyCols: Seq[String],
    sumCols: Seq[String],
    statePath: String) {

  val freqCol = "__freq"
  private def sumName(c: String) = s"sum_$c"
  private var version: Int = -1

  private def versionDir(v: Int) = s"$statePath/v$v"

  /** Partial-aggregate a freq-annotated change set. */
  private def partials(delta: DataFrame): DataFrame = {
    val aggs =
      sum(col(freqCol)).as("cnt") +:
        sumCols.map(c =>
          sum(col(c).cast(DecimalType(18, 2)) * col(freqCol))
            .cast(DecimalType(38, 2)).as(sumName(c)))
    delta.groupBy(keyCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Build v0 state from a base table (implicit freq = 1 per row). */
  def initialize(base: DataFrame): Unit = {
    val withFreq =
      if (base.columns.contains(freqCol)) base
      else base.withColumn(freqCol, lit(1L))
    partials(withFreq).write.mode("overwrite").parquet(versionDir(0))
    version = 0
  }

  /** Apply one freq-annotated delta batch → next snapshot version. */
  def applyDelta(delta: DataFrame): Unit = {
    require(version >= 0, "view not initialized")
    require(delta.columns.contains(freqCol), s"delta needs $freqCol")
    val state = spark.read.parquet(versionDir(version))
    val merged = state.unionByName(partials(delta))
      .groupBy(keyCols.map(col): _*)
      .agg(
        sum(col("cnt")).as("cnt"),
        sumCols.map(c => sum(col(sumName(c))).cast(DecimalType(38, 2)).as(sumName(c))): _*)
      .filter(col("cnt") =!= 0)
    merged.write.mode("overwrite").parquet(versionDir(version + 1))
    version += 1
  }

  /** Finalized view: count, sums, and derived averages per key. */
  def current(): DataFrame = at(version)

  /** Time-travel read of any retained snapshot version — the Spark-side
    * analog of the reference's MVCC read-at-LogicalTimestamp scans
    * (/root/reference/src/storage/src/table.rs:128-171): every applyDelta
    * produces an immutable version, so historical states stay queryable. */
  def at(v: Int): DataFrame = {
    require(version >= 0, "view not initialized")
    require(v >= 0 && v <= version, s"version $v out of range [0, $version]")
    val st = spark.read.parquet(versionDir(v))
    val finalCols =
      keyCols.map(col) ++ Seq(col("cnt")) ++
        sumCols.map(c => col(sumName(c))) ++
        sumCols.map(c =>
          (col(sumName(c)).cast(DoubleType) / col("cnt")).as(s"avg_$c"))
    st.select(finalCols: _*)
  }

  def currentVersion: Int = version

  /** Continuous maintenance: subscribe the view to a streaming source of
    * freq-annotated deltas. Each micro-batch becomes one applyDelta merge —
    * Structured Streaming's exactly-once foreachBatch gives the refresh
    * loop the reference's storage layer was being built for
    * (storage.rs:34-63 log-section design). */
  def maintainFrom(deltaStream: DataFrame): org.apache.spark.sql.streaming.StreamingQuery =
    deltaStream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) applyDelta(batch)
      }
      .start()
}
