package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins for the shuffle-free IVF assignment path:
  *
  *   1. the driver-rendered centroid literal (Similarity.centroidMatrixSql)
  *      is BIT-IDENTICAL to the SQL md5 derivation (centroidSql) that the
  *      DuckDB oracle replays — if either formula drifts, assignment and
  *      oracle silently diverge;
  *   2. argmax_dot picks the same winner as the window-function spelling
  *      `row_number() OVER (ORDER BY dot_product DESC, idx) = 1` it
  *      replaced, including the lowest-index tie-break;
  *   3. edge semantics: empty plane matrix → NULL (no rows → no rank-1
  *      row in the window spelling either), and jaccard_sorted of two
  *      empty arrays → NULL (0/0, matching non-ANSI division).
  */
class SimilarityKernelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("driver-rendered centroid literal equals the SQL md5 derivation bit for bit") {
    val fromSql = spark.sql(queries.Similarity.centroidSql)
      .orderBy("cid").collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1))
    val fromLiteral = spark.sql(
      s"SELECT ${queries.Similarity.centroidMatrixSql} AS m")
      .collect().head.getSeq[Seq[Double]](0)
    assert(fromSql.length == 16 && fromLiteral.length == 16)
    fromSql.foreach { case (cid, cv) =>
      assert(cv.length == 64)
      // exact double equality on purpose: the literal must round-trip
      cv.zip(fromLiteral(cid)).zipWithIndex.foreach { case ((a, b), d) =>
        assert(java.lang.Double.doubleToLongBits(a) ==
               java.lang.Double.doubleToLongBits(b),
          s"centroid $cid dim $d: sql=$a literal=$b")
      }
    }
  }

  test("argmax_dot matches the window-argmax it replaced on seeded random vectors") {
    val rnd = new scala.util.Random(7)
    val planes: Seq[Seq[Double]] = Seq.fill(16)(Seq.fill(8)(rnd.nextDouble() - 0.5))
    val vecs: Seq[(Int, Seq[Double])] =
      Seq.tabulate(60)(i => i -> Seq.fill(8)(rnd.nextDouble() - 0.5))

    def refArgmax(v: Seq[Double]): Int = {
      val dots = planes.map(p => v.zip(p).foldLeft(0.0) { case (s, (a, b)) => s + a * b })
      dots.zipWithIndex.minBy { case (d, i) => (-d, i) }._2
    }

    val planesSql = planes
      .map(p => s"array(${p.map(x => s"${x}D").mkString(",")})")
      .mkString("array(", ",", ")")
    val got = vecs.toDF("i", "v")
      .selectExpr("i", s"argmax_dot(v, $planesSql) AS am")
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    vecs.foreach { case (i, v) => assert(got(i) == refArgmax(v), s"vec $i") }
  }

  test("argmax_dot tie-break is lowest index; empty matrix is NULL") {
    val rows = spark.sql(
      """SELECT
        |  argmax_dot(array(1.0D, 0.0D),
        |    array(array(0.5D, 0.5D), array(0.5D, 0.5D), array(0.0D, 0.0D))) AS tie,
        |  argmax_dot(array(1.0D),
        |    CAST(array() AS array<array<double>>)) AS empty""".stripMargin).collect().head
    assert(rows.getInt(0) == 0, "equal dots must keep the lowest index")
    assert(rows.isNullAt(1), "empty plane matrix must be NULL")
  }

  test("jaccard_sorted of two empty arrays is NULL (0/0), nonempty unchanged") {
    val r = spark.sql(
      """SELECT
        |  jaccard_sorted(CAST(array() AS array<string>),
        |                 CAST(array() AS array<string>)) AS both_empty,
        |  jaccard_sorted(CAST(array() AS array<string>), array('a')) AS one_empty,
        |  jaccard_sorted(array('a','b'), array('b','c')) AS j""".stripMargin)
      .collect().head
    assert(r.isNullAt(0))
    assert(r.getDouble(1) == 0.0)
    assert(r.getDouble(2) == 1.0 / 3.0)
  }

  test("semantic dedup drops exactly the vectors with a lower-id cell-mate above tau") {
    val sf = "/root/testdata/sf0.001"
    val out = queries.Similarity.semanticDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2)))
    val total = Engine.table(spark, sf, "embeddings").count()
    assert(out.length == total, "every vector must be reported exactly once")
    // C is corpus-sized: smallest power of two with C² ≥ N, floored at 16
    val c = queries.Similarity.semanticC(total)
    assert(c * c >= total && (c == 16 || (c / 2) * (c / 2) < total))
    assert(out.map(_._2).distinct.forall(cell => cell >= 0 && cell < c))

    // recompute the keep rule the expensive way: exact within-cell cosine
    val vecs = Engine.table(spark, sf, "embeddings").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val cellOf = out.map(t => t._1 -> t._2).toMap
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    out.foreach { case (id, cell, kept) =>
      val hasLowerDup = vecs.keys.exists(o =>
        o < id && cellOf(o) == cell && dot(vecs(o), vecs(id)) >= 0.35)
      assert(kept == !hasLowerDup, s"vec $id kept=$kept but lower-dup=$hasLowerDup")
    }
    assert(out.exists(!_._3) || total < 100, "corpus should contain semantic dups")
  }
}
