package graft

import graft.queries.Dedup
import org.scalatest.funsuite.AnyFunSuite

/** dedup_keep_best = dedup_clusters' labels + a keep-longest window.
  * The pin is consistency from first principles: on a corpus built to
  * contain multi-member near-dup clusters (and singletons), the operator
  * must emit EXACTLY one row per multi-member cluster of the clustering
  * it composes with, and that row must be the longest member (doc_id
  * tiebreak) with the right member count — expected values derived
  * in-test from dedupClusters' own output plus raw text lengths, so a
  * drift between the two operators' cluster views cannot hide.
  */
class KeepBestSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("keep-best emits the longest member of every multi-member cluster") {
    import spark.implicits._
    // Three near-dup families (shared 30-word base, members extended by
    // 0/2/4 words → pairwise shingle Jaccard far above 0.5) + singletons.
    // Member lengths differ, so keep-longest is discriminating; family 2
    // lists the LONGEST member first to catch an ordering assumption.
    val rows = (0 until 3).flatMap { g =>
      val base = (0 until 30).map(j => s"g${g}w$j")
      val exts = if (g == 2) Seq(4, 2, 0) else Seq(0, 2, 4)
      exts.zipWithIndex.map { case (e, m) =>
        (g * 10L + m, (base ++ (0 until e).map(j => s"g${g}x$j")).mkString(" "))
      }
    } ++ (0 until 4).map(s => (100L + s, (0 until 20).map(j => s"s${s}u$j").mkString(" ")))
    val dir = java.nio.file.Files.createTempDirectory("graft_keepbest_").toString
    rows.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'test' AS source",
        "CAST(length(text) AS BIGINT) AS n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val lens = rows.map { case (id, t) => id -> t.length }.toMap
    val labels = Dedup.dedupClusters(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expected = labels.groupBy(_._2).filter(_._2.length >= 2).map {
      case (cid, ms) =>
        val keep = ms.map(_._1).minBy(d => (-lens(d), d))
        (cid, keep, lens(keep), ms.length)
    }.toSet
    assert(expected.size >= 3, s"corpus failed to form 3 clusters: $expected")
    assert(expected.forall(_._4 == 3), s"families must be 3-member: $expected")

    val got = Dedup.dedupKeepBest(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3))).toSet
    assert(got == expected, s"got=$got expected=$expected")
    // singletons never appear
    assert(got.forall { case (_, keep, _, _) => keep < 100L })
  }
}
