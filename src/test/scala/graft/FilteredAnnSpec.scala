package graft

import graft.queries.Similarity
import org.scalatest.funsuite.AnyFunSuite

/** Pins for filtered vector search (`ann_filtered`): the label predicate
  * must actually constrain the result (label correctness), the filter
  * must not silently collapse recall (floor vs the EXACT filtered
  * brute-force ground truth, unrestricted by probes), and filtering must
  * happen before ranking (ranks are contiguous over qualifying
  * candidates only).
  */
class FilteredAnnSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  private lazy val result =
    Similarity.ivfFilteredTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(4)))

  private lazy val labels: Map[Long, Int] = {
    val df = Engine.table(spark, sf, "embeddings")
    df.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
  }

  test("every returned candidate carries its query's label") {
    assert(result.nonEmpty, "filtered search returned nothing — vacuous")
    result.foreach { case (q, c, lab, _) =>
      assert(lab == labels(q) && labels(c) == labels(q),
        s"query $q (label ${labels(q)}) got candidate $c with label ${labels(c)}")
    }
  }

  test("ranks are contiguous per query — the filter ran before ranking, not after") {
    result.groupBy(_._1).foreach { case (q, rows) =>
      val ranks = rows.map(_._4).sorted.toSeq
      assert(ranks == (1 to rows.length), s"query $q ranks not contiguous: $ranks")
      assert(rows.length <= 10)
    }
  }

  test("recall vs exact filtered brute force stays above the nProbe=8 floor") {
    // exact ground truth: per query, top-10 by dot among SAME-label
    // candidates over the whole corpus (no probe restriction)
    Engine.table(spark, sf, "embeddings").createOrReplaceTempView("embeddings")
    val exact = spark.sql(
      """WITH e AS (
        |  SELECT vec_id, label, transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |q AS (SELECT vec_id AS query_id, label, v AS qv FROM e WHERE vec_id < 8)
        |SELECT query_id, cand_id FROM (
        |  SELECT q.query_id, c.vec_id AS cand_id,
        |    row_number() OVER (PARTITION BY q.query_id ORDER BY
        |      dot_product(q.qv, c.v) DESC, c.vec_id) AS rnk
        |  FROM q JOIN e c ON c.label = q.label AND c.vec_id <> q.query_id) t
        |WHERE rnk <= 10""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val got = result.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exact.map { case (q, truth) =>
      val hit = got.getOrElse(q, Set.empty).intersect(truth).size
      hit.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    // measured 0.8+ at nProbe=8/C=16 on this corpus; pin a floor with
    // headroom so centroid drift fails loudly, not flakily
    assert(mean >= 0.5, f"mean filtered recall@10 = $mean%.3f below floor 0.5")
  }
}
