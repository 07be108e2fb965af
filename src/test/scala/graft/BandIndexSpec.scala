package graft

import graft.queries.Dedup
import org.scalatest.funsuite.AnyFunSuite

/** Persisted-band-index pins: `dedup_indexed` must produce exactly the
  * in-flight incremental probe's relation while reading the index side's
  * signatures from storage — the at-ingest indexing shape SCALE.md's
  * incremental section describes. Equality (not just count) matters: the
  * rep-collapse, rep-expansion, and same-fp arms all cross the
  * storage boundary, and each can silently under- or over-produce if the
  * persisted group map drifts from the in-flight window.
  */
class BandIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def corpus(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_bandidx_").toString
    import spark.implicits._
    rows.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'test' AS source",
        "CAST(length(text) AS BIGINT) AS n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private val textX = "the quick brown fox jumps over the lazy dog again and again"
  private val textY = "the quick brown fox jumps over the lazy dog again and again today"

  test("stored-index probe is row-identical to the in-flight incremental probe") {
    val viaIndex = Dedup.indexedPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
    val inFlight = Dedup.incrementalPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
    assert(viaIndex.nonEmpty, "probe produced no pairs at sf0.001")
    assert(viaIndex.toSeq == inFlight.toSeq,
      s"stored-index relation diverged: ${viaIndex.length} vs ${inFlight.length} rows")
  }

  test("duplicate groups spanning the storage boundary expand completely") {
    // 40 copies of X: 4 delta-side (doc_id%10=0), 36 in the stored index.
    // Every cross-boundary pair must surface at Jaccard exactly 1.0
    // through the persisted group map — 4×36 pairs, none via banding
    // copies (the index stores one rep's bands per fp group).
    val dir = corpus((0L until 40L).map(i => (i, textX)))
    val pairs = Dedup.indexedPairs(spark, dir).collect()
    assert(pairs.length == 4 * 36, s"pairs: ${pairs.length}")
    assert(pairs.forall(_.getDouble(2) == 1.0))
    assert(pairs.forall(r => r.getLong(0) % 10 == 0 && r.getLong(1) % 10 != 0))
  }

  test("appended index batches probe identically to a one-shot rebuild") {
    // 6 docs: delta {0}; index {1,2} = exact copies of X, {21,22,23} =
    // copies of Y (X~Y at Jaccard 10/11). Expected pairs: (0,1),(0,2)
    // via the same-fp arm at 1.0 plus (0,21),(0,22),(0,23) via banding.
    val dir = corpus(Seq(0L -> textX, 1L -> textX, 2L -> textX,
      21L -> textY, 22L -> textY, 23L -> textY))
    val one = java.nio.file.Files
      .createTempDirectory("graft_bidx_one_").resolve("i").toString
    Dedup.writeBandIndex(spark, dir, one)
    val expected = Dedup.probeBandIndex(spark, dir, one).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
    assert(expected.length == 5, s"one-shot index should yield 5 pairs: ${expected.length}")

    // same index built as TWO appended batches, split so BOTH dup groups
    // span the appends (X reps 1 and 2, Y reps 21 and 22 — two banded
    // reps per fp group). The probe must verify through either rep yet
    // emit each member pair exactly once: without the DISTINCT fp-pair
    // collapse, the three Y pairs would double.
    val app = java.nio.file.Files
      .createTempDirectory("graft_bidx_app_").resolve("i").toString
    Dedup.writeBandIndex(spark, dir, app, pred = "doc_id % 2 = 1")
    Dedup.writeBandIndex(spark, dir, app, mode = "append", pred = "doc_id % 2 = 0")
    val got = Dedup.probeBandIndex(spark, dir, app).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
    assert(got.toSeq == expected.toSeq,
      s"append diverged from rebuild: ${got.length} vs ${expected.length} rows")
  }

  test("probe plan reads bands from storage and broadcasts the batch side") {
    val idx = java.nio.file.Files
      .createTempDirectory("graft_band_index_spec_").resolve("index").toString
    Dedup.writeBandIndex(spark, sf, idx)
    val p = Dedup.probeBandIndex(spark, sf, idx).queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    // the index side must come from the persisted parquet, not be re-derived
    assert(p.contains(idx), "no FileScan of the persisted band index in the plan")
    // the batch side is the broadcast build of the candidate join — the
    // stored band table streams through it with no index-side shuffle
    assert(p.contains("BroadcastHashJoin"), "candidate join lost its broadcast shape")
    // the stored relations carry ids/hashes only — never text or shingles
    val stored = spark.read.parquet(s"$idx/bands")
    assert(stored.schema.fieldNames.toSet == Set("doc_id", "band_idx", "band_sig"))
    val groups = spark.read.parquet(s"$idx/groups")
    assert(groups.schema.fieldNames.toSet == Set("doc_id", "fp"))
  }
}
