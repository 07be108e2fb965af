package graft

import graft.queries.Dedup
import org.scalatest.funsuite.AnyFunSuite

/** Ground-truth pins for span-level exact dedup (`dedup_span_exact`).
  * The driver oracle proves Spark↔DuckDB agreement; this spec proves the
  * agreed result is the RIGHT one on planted corpora where the repeated
  * regions are known — in particular the property that motivated the
  * winnow-anchored design over stride-sampled windows: detection must
  * not depend on the two copies of a repeat being aligned mod the
  * sampling stride. A stride-16 grid misses an unaligned repeat with
  * probability 15/16; the content-defined anchors must catch every
  * planted offset.
  */
class SpanDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val guarantee = 79 // spanWin + spanK - 1

  private def randText(seed: Int, n: Int): String = {
    val rnd = new scala.util.Random(seed)
    val sb = new StringBuilder
    while (sb.length < n) {
      val wordLen = 3 + rnd.nextInt(8)
      (0 until wordLen).foreach(_ => sb += ('a' + rnd.nextInt(26)).toChar)
      sb += ' '
    }
    sb.toString.substring(0, n).trim
  }

  private def runOn(docs: Seq[(Long, String)]): Map[Long, (Int, Int, Double)] = {
    val dir = java.nio.file.Files.createTempDirectory("graft_span_").toString
    import spark.implicits._
    docs.map { case (id, t) => (id, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Dedup.spanDedup(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getDouble(3))))
      .toMap
  }

  test("a planted 100-char repeat is caught at EVERY alignment offset") {
    val region = randText(7, 100)
    val a = randText(1, 120) + " " + region + " " + randText(2, 120)
    // each copy embeds the identical region after a prefix whose length
    // varies by 1 — five distinct alignments mod any stride the
    // implementation might secretly assume
    val copies = (0 until 5).map { s =>
      (10L + s, randText(100 + s, 50 + s) + " " + region + " " + randText(200 + s, 60))
    }
    val res = runOn((1L, a) +: copies)
    (Seq(1L) ++ copies.map(_._1)).foreach { id =>
      val (_, dup, _) = res(id)
      assert(dup >= 1, s"doc $id: planted repeat not detected (alignment-dependent recall)")
    }
  }

  test("exact duplicate docs report dup_frac 1.0; unique docs report 0") {
    val dup = randText(11, 300)
    val res = runOn(Seq(
      (1L, dup), (2L, dup),
      (3L, randText(12, 300)), (4L, randText(13, 300))))
    assert(res(1L)._3 == 1.0 && res(2L)._3 == 1.0,
      s"exact copies not fully flagged: ${res(1L)}, ${res(2L)}")
    assert(res(3L)._2 == 0 && res(4L)._2 == 0,
      s"unique docs falsely flagged: ${res(3L)}, ${res(4L)}")
  }

  test("precision: a shared region SHORTER than one gram is never evidence") {
    // 40 shared chars < k=64: no 64-gram fits inside the overlap, so the
    // docs must not be flagged — this is exactly what k=8 winnowing
    // (ta_winnow's similarity parameters) cannot promise
    val short = randText(21, 40)
    val res = runOn(Seq(
      (1L, randText(22, 150) + " " + short + " " + randText(23, 150)),
      (2L, randText(24, 150) + " " + short + " " + randText(25, 150))))
    assert(res(1L)._2 == 0 && res(2L)._2 == 0,
      s"sub-gram overlap flagged as a duplicated span: ${res(1L)}, ${res(2L)}")
  }

  test("guarantee boundary: repeats at w+k-1 chars are always anchored in both copies") {
    val region = randText(31, guarantee)
    val res = runOn(Seq(
      (1L, randText(32, 90) + " " + region + " " + randText(33, 90)),
      (2L, randText(34, 77) + " " + region + " " + randText(35, 90))))
    assert(res(1L)._2 >= 1 && res(2L)._2 >= 1,
      s"guarantee-length repeat missed: ${res(1L)}, ${res(2L)}")
  }

  test("anchor index: append equals rebuild, and the probe matches a direct anchor join") {
    val sf = "/root/testdata/sf0.001"
    val rebuilt = {
      val idx = java.nio.file.Files
        .createTempDirectory("graft_spanidx_a_").resolve("index").toString
      Dedup.writeAnchorIndex(spark, sf, idx)
      Dedup.probeAnchorIndex(spark, sf, idx).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    }
    assert(rebuilt.nonEmpty, "no cross-slice shared spans — test is vacuous")

    // incremental maintenance: index side lands as two appended batches
    val appended = {
      val idx = java.nio.file.Files
        .createTempDirectory("graft_spanidx_b_").resolve("index").toString
      Dedup.writeAnchorIndex(spark, sf, idx, pred = "doc_id % 2 = 0")
      Dedup.writeAnchorIndex(spark, sf, idx, mode = "append", pred = "doc_id % 2 <> 0")
      Dedup.probeAnchorIndex(spark, sf, idx).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    }
    assert(appended.sorted == rebuilt.sorted,
      "appended anchor index diverges from a rebuild")

    // first principles: direct kernel-anchor join over collected docs
    val docs = Engine.table(spark, sf, "documents").select("doc_id", "text")
      .collect().map { r =>
        val t = r.getString(1).trim.toLowerCase.replaceAll("\\s+", " ")
        r.getLong(0) ->
          graft.functions.WinnowAnchors.compute(t.getBytes("UTF-8"), 64, 16).toSet
      }.toMap
    val direct = (for {
      (d, dFps) <- docs.toSeq if d % 10 == 0
      (i, iFps) <- docs.toSeq if i % 10 != 0
      shared = (dFps intersect iFps).size if shared > 0
    } yield (d, i, shared)).sorted
    assert(rebuilt.sorted == direct,
      s"probe diverges from the direct join: ${rebuilt.length} vs ${direct.length}")
  }

  test("plan: no exchange carries document text; anchors shuffle as encoded ids") {
    val p = Dedup.spanDedup(spark, "/root/testdata/sf0.001")
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("Generate"), "the gram-position explode disappeared")
    val exchangeInputs = """\(\d+\) Exchange\n(Input[^\n]*)""".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(exchangeInputs.nonEmpty, "no Exchange details found in formatted plan")
    val textAttr = """\b(t|text)#\d+""".r
    exchangeInputs.foreach { in =>
      assert(textAttr.findFirstIn(in).isEmpty,
        s"an exchange carries document text: $in")
    }
  }
}
