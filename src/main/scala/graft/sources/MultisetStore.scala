package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Freq-compacting multiset table — the reference's storage model for
  * user tables re-expressed over parquet.
  *
  * In the reference every stored tuple carries an i64 frequency and the
  * write path MERGES freq per identical tuple at write time
  * (/root/reference/src/storage/src/table.rs:309-347: `freq += last_freq`
  * on key collision); INSERT appends +1 per row, DELETE appends −1 via
  * NegateFreq (delete.rs:56-60), and a read materializes `freq` copies of
  * each surviving tuple. This store keeps the same contract:
  *
  *   - state is a compacted parquet snapshot of (columns…, __freq: Long),
  *     one row per DISTINCT tuple — physical duplication never persists;
  *   - `append(df, freq)` merges the delta into a NEW versioned snapshot
  *     (read-modify-write through a fresh directory — never overwriting
  *     the snapshot being read, safe on object stores; same pattern as
  *     ivm.IncrementalAggView's state snapshots, which carry the same
  *     `__freq` column — one freq model across storage and IVM);
  *   - `read` expands `__freq` copies per tuple (freq ≤ 0 rows yield
  *     nothing, matching the reference's read path; negative freq is
  *     retained in state, as the reference retains it, so a retraction
  *     arriving before its insert nets out correctly).
  *
  * Scale: the merge is ONE hash aggregation keyed on the tuple — the same
  * shuffle a distinct would cost — and its input is |state| + |delta|
  * where |state| is bounded by distinct tuples, not inserts. On a real
  * cluster, bucketing the snapshot by the tuple hash makes the merge
  * co-partitioned and the exchange disappears from the write path.
  */
object MultisetStore {

  val freqCol = "__freq"

  private def versionOf(spark: SparkSession, path: String): Option[Int] = {
    val dir = new java.io.File(path)
    if (!dir.isDirectory) None
    else dir.list().filter(_.matches("v\\d+")).map(_.drop(1).toInt)
      .sorted.lastOption
  }

  private def versionDir(path: String, v: Int) = s"$path/v$v"

  /** Merge `df` into the multiset at `path`, each row weighted `freq`
    * (+1 = insert, −1 = single-copy delete — NegateFreq). Compacts per
    * full tuple: the snapshot never holds two rows with equal columns. */
  def append(spark: SparkSession, path: String, df: DataFrame, freq: Long = 1L): Unit = {
    val dataCols = df.columns.filter(_ != freqCol).toIndexedSeq
    val delta =
      if (df.columns.contains(freqCol)) df.select(dataCols.map(col) :+ col(freqCol): _*)
      else df.select(dataCols.map(col): _*).withColumn(freqCol, lit(freq))
    val merged = versionOf(spark, path) match {
      case None => delta
      case Some(v) => spark.read.parquet(versionDir(path, v)).unionByName(delta)
    }
    val next = versionOf(spark, path).map(_ + 1).getOrElse(0)
    merged.groupBy(dataCols.map(col): _*)
      .agg(sum(col(freqCol)).as(freqCol))
      .filter(col(freqCol) =!= 0L) // fully-retracted tuples compact away
      .write.mode("overwrite").parquet(versionDir(path, next))
  }

  /** The multiset expanded back to rows: `__freq` copies per tuple. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val v = versionOf(spark, path).getOrElse(
      throw new IllegalStateException(s"no multiset snapshot at $path"))
    val snap = spark.read.parquet(versionDir(path, v))
    val dataCols = snap.columns.filter(_ != freqCol).toIndexedSeq
    snap.filter(col(freqCol) > 0L)
      .withColumn("__copy", explode(expr(s"sequence(1, $freqCol)")))
      .select(dataCols.map(col): _*)
  }

  /** The compacted snapshot itself: one row per distinct tuple + freq. */
  def snapshot(spark: SparkSession, path: String): DataFrame = {
    val v = versionOf(spark, path).getOrElse(
      throw new IllegalStateException(s"no multiset snapshot at $path"))
    spark.read.parquet(versionDir(path, v))
  }
}
