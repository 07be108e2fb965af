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
    * full tuple: the snapshot never holds two rows with equal columns.
    *
    * Concurrency: optimistic read-modify-write. The base version is read
    * ONCE, the merged snapshot is written to a hidden staging directory,
    * then atomically renamed to `v<base+1>` — the version directory
    * therefore only ever appears fully formed, so a concurrent reader
    * never observes a partial snapshot. If another writer claimed that
    * version first the rename fails, the staging output is discarded,
    * and the whole merge retries against the NEW base — no delta is ever
    * silently lost (the reference gets the same guarantee from its
    * single-writer storage engine, table.rs:309-347). The commit step uses
    * java.nio (local-filesystem paths): on a distributed filesystem or
    * object store, where java.nio cannot address the path, run
    * single-writer per path or port the claim step to that store's
    * rename/conditional-put — the same discipline every file-commit
    * protocol needs there.
    */
  def append(spark: SparkSession, path: String, df: DataFrame, freq: Long = 1L): Unit = {
    val dataCols = df.columns.filter(_ != freqCol).toIndexedSeq
    val delta =
      if (df.columns.contains(freqCol)) df.select(dataCols.map(col) :+ col(freqCol): _*)
      else df.select(dataCols.map(col): _*).withColumn(freqCol, lit(freq))
    var committed = false
    var attempts = 0
    while (!committed) {
      attempts += 1
      require(attempts <= 20, s"multiset append at $path lost the version race 20 times")
      val base = versionOf(spark, path) // read exactly once per attempt
      val merged = base match {
        case None => delta
        case Some(v) => spark.read.parquet(versionDir(path, v)).unionByName(delta)
      }
      val next = base.map(_ + 1).getOrElse(0)
      val staging = java.nio.file.Paths.get(
        path, s"_staging_v${next}_${java.util.UUID.randomUUID().toString.take(8)}")
      merged.groupBy(dataCols.map(col): _*)
        .agg(sum(col(freqCol)).as(freqCol))
        .filter(col(freqCol) =!= 0L) // fully-retracted tuples compact away
        .write.mode("overwrite").parquet(staging.toString)
      val target = java.nio.file.Paths.get(versionDir(path, next))
      try {
        java.nio.file.Files.move(staging, target,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        committed = true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException
             | _: java.nio.file.FileSystemException =>
          // lost the race: another writer owns v<next>; re-merge on top
          if (java.nio.file.Files.exists(target)) deleteRecursively(staging)
          else throw new IllegalStateException(
            s"atomic rename to $target failed but the version is unclaimed")
      }
    }
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (java.nio.file.Files.exists(p)) {
      val s = java.nio.file.Files.walk(p)
      try s.iterator().asScala.toVector.reverse.foreach(java.nio.file.Files.delete)
      finally s.close()
    }
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
