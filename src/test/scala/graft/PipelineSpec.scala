package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property pins for the LLM-pipeline operators whose semantics DuckDB
  * can't mirror (engine-specific hashing) — the "weaker rows-only check"
  * gets its teeth here instead.
  */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("minhash LSH finds only verified near-duplicates, ordered pairs") {
    val rows = queries.Dedup.minhashPairs(spark, sf).collect()
    assert(rows.nonEmpty, "corpus contains seeded near-dups")
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "pairs are ordered id_a < id_b")
      assert(r.getDouble(2) >= 0.5 && r.getDouble(2) <= 1.0)
    }
  }

  test("minhash candidates contain every exact-duplicate-grade pair found by brute force on a sample") {
    // Brute-force exact Jaccard over the first 120 docs; every pair at
    // >= 0.9 must be recalled by the LSH path (16 bands × 4 rows has
    // ~(1-(1-0.9^4)^16) ≈ 1.0 recall at that similarity).
    val got = queries.Dedup.minhashPairs(spark, sf)
      .filter(col("jaccard") >= 0.9)
      .filter(col("id_a") < 120 && col("id_b") < 120)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    Engine.table(spark, sf, "documents").createOrReplaceTempView("documents")
    val brute = spark.sql(
      """WITH sh AS (
        |  SELECT doc_id, array_distinct(transform(sequence(0, size(tokens)-3),
        |    i -> concat_ws(' ', tokens[i], tokens[i+1], tokens[i+2]))) AS shingles
        |  FROM (SELECT doc_id, filter(split(text, ' '), x -> x <> '') AS tokens
        |        FROM documents WHERE doc_id < 120))
        |SELECT a.doc_id, b.doc_id
        |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |WHERE CAST(size(array_intersect(a.shingles, b.shingles)) AS DOUBLE)
        |    / size(array_union(a.shingles, b.shingles)) >= 0.9""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.subsetOf(got), s"missed: ${brute -- got}")
  }

  test("simhash pairs are within the hamming bound") {
    val rows = queries.Dedup.simhashPairs(spark, sf).collect()
    rows.foreach(r => assert(r.getInt(2) <= 3))
  }

  test("ngram jaccard pairs meet the threshold and order invariant") {
    val rows = queries.Dedup.ngramJaccardPairs(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.4)
    }
  }

  test("brute-force ANN returns exactly k ranked neighbors per query") {
    val rows = queries.Similarity.bruteForceTopK(spark, sf, nQueries = 4, k = 5).collect()
    val byQuery = rows.groupBy(_.getLong(0))
    assert(byQuery.keySet == Set(0L, 1L, 2L, 3L))
    byQuery.values.foreach { g =>
      assert(g.length == 5)
      val scores = g.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(scores.sameElements(scores.sorted.reverse), "ranked by descending score")
    }
    rows.foreach(r => assert(r.getLong(0) != r.getLong(1), "self excluded"))
  }

  test("IVF ANN recalls most of brute-force top-k") {
    val bf = queries.Similarity.bruteForceTopK(spark, sf, nQueries = 8, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = queries.Similarity.ivfTopK(spark, sf, nQueries = 8, k = 10, nProbe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (bf & ivf).size.toDouble / bf.size
    assert(recall >= 0.3, s"IVF recall $recall too low even at nProbe=8/16")
  }

  test("embedding cosine near-dup pairs are symmetric-free and above threshold") {
    val rows = queries.Dedup.embeddingCosinePairs(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.3)
    }
  }

  test("mm_decode produces one feature row per media row with sane stats") {
    val rows = queries.Multimodal.decodeFeatures(spark, sf).collect()
    val n = Engine.table(spark, sf, "documents").count()
    assert(rows.length == n)
    rows.foreach { r =>
      val mean = r.getAs[Double]("byte_mean")
      assert(mean > 0 && mean < 256)
      assert(r.getAs[Int]("n_bytes") > 0)
      assert(r.getAs[String]("frame_samples").startsWith("["))
    }
  }

  test("dedup_clusters: every near-dup pair lands in one cluster, labeled by its min member") {
    val pairs = queries.Dedup.minhashPairs(spark, sf, threshold = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val cluster = queries.Dedup.dedupClusters(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    pairs.foreach { case (a, b) =>
      assert(cluster(a) == cluster(b), s"pair ($a,$b) split across clusters")
    }
    // label is the minimum member of its cluster
    cluster.groupBy(_._2).foreach { case (lab, members) =>
      assert(lab == members.keys.min)
    }
    // singletons keep their own id
    val inPairs = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    cluster.filterNot { case (d, _) => inPairs(d) }
      .foreach { case (d, lab) => assert(d == lab) }
  }

  test("mm_resize fits output dims inside 256 preserving aspect") {
    val rows = queries.Multimodal.resize(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (iw, ih) = (r.getAs[Int]("in_w"), r.getAs[Int]("in_h"))
      val (ow, oh) = (r.getAs[Int]("out_w"), r.getAs[Int]("out_h"))
      assert(ow <= 256 && oh <= 256 && ow >= 1 && oh >= 1)
      assert(math.max(ow, oh) == 256) // long side lands exactly on the fit
      // aspect preserved within integer truncation (short side can be as
      // small as 12px, so the truncation error is up to ~1/12 relative)
      val inRatio = iw.toDouble / ih
      assert(math.abs(ow.toDouble / oh - inRatio) <= inRatio * 0.1)
    }
  }

  test("language ID agrees with labels where markers exist (en docs)") {
    val rows = queries.TextAnalysis.langId.run(spark, sf).collect()
    assert(rows.nonEmpty)
    val preds = rows.map(_.getString(2)).toSet
    assert(preds.subsetOf(Set("en", "es", "fr", "de", "und")))
    // The classifier must actually fire — a broken marker regex silently
    // predicts 'und' for every row (regression guard for \b escaping).
    val enRows = rows.filter(_.getString(1) == "en")
    val enHits = enRows.count(_.getString(2) == "en")
    assert(enRows.nonEmpty && enHits * 2 > enRows.length,
      s"en recall too low: $enHits/${enRows.length}")
  }
}
