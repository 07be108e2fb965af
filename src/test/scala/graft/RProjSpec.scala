package graft

import graft.queries.Similarity
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the integer-exact JL random projection (`emb_rproj`,
  * `ann_rproj_topk`):
  *
  *   1. the driver-rendered ±1 sign literal equals the Spark-SQL md5
  *      derivation (the same formula the DuckDB oracle replays) — if
  *      either spelling drifts, projection and oracle silently diverge;
  *   2. the rproj_i64 kernel equals a from-scratch replay of
  *      quantize-then-sign-sum on seeded random vectors (negatives
  *      included — floor(x·2^20 + 0.5) is round-half-up, not truncation);
  *   3. dot_i64 is the exact zip-product sum, truncating to the shorter
  *      array like dot_product;
  *   4. the projection is a pure per-row projection — no Exchange in its
  *      plan — and the projected ranking keeps usable recall against the
  *      exact float cosine top-k (JL at 16 of 64 dims);
  *   5. kernel (codegen path) ≡ the interpreted eval.
  */
class RProjSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("sign literal equals the SQL md5 derivation bit for bit") {
    val fromSql = spark.sql(
      """SELECT k, j,
        |  CASE WHEN CAST(conv(substr(md5(
        |    concat('rp_', CAST(k AS STRING), '_', CAST(j AS STRING))), 1, 15), 16, 10) AS BIGINT)
        |    % 2 = 0 THEN 1 ELSE -1 END AS sgn
        |FROM (SELECT explode(sequence(0, 15)) AS k)
        |CROSS JOIN (SELECT explode(sequence(0, 63)) AS j)""".stripMargin)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getInt(2)).toMap
    val signs = Similarity.rprojSigns()
    for (k <- 0 until 16; j <- 0 until 64)
      assert(fromSql((k, j)) == signs(k)(j), s"sign($k,$j)")
  }

  test("rproj_i64 equals the from-scratch quantize-then-sum replay") {
    val rnd = new scala.util.Random(11)
    val vecs: Seq[(Int, Seq[Double])] =
      Seq.tabulate(50)(i => i -> Seq.fill(64)(rnd.nextDouble() * 2 - 1))
    val signs = Similarity.rprojSigns()
    def refProj(v: Seq[Double]): Seq[Long] = {
      val q = v.map(x => math.floor(x * 1048576.0 + 0.5).toLong)
      (0 until 16).map(k => (0 until 64).map(j => signs(k)(j) * q(j)).sum)
    }
    import spark.implicits._
    val got = vecs.toDF("i", "v")
      .selectExpr("i", s"rproj_i64(v, ${Similarity.rprojSignsSql}) AS p")
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    vecs.foreach { case (i, v) => assert(got(i) == refProj(v), s"vec $i") }
  }

  test("codegen and interpreted eval agree") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType}
    val rnd = new scala.util.Random(13)
    val v = Array.fill(64)(rnd.nextDouble() * 2 - 1)
    val signs = Similarity.rprojSigns()
    val expr = graft.functions.RProjI64(
      Literal(new GenericArrayData(v), ArrayType(DoubleType)),
      Literal(new GenericArrayData(signs.map(r => new GenericArrayData(r.map(x => x: Any)))),
        ArrayType(ArrayType(IntegerType))))
    val interpreted = expr.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray().toSeq
    import spark.implicits._
    val viaCodegen = Seq(Tuple1(v.toSeq)).toDF("v")
      .selectExpr(s"rproj_i64(v, ${Similarity.rprojSignsSql}) AS p")
      .collect().head.getSeq[Long](0)
    assert(interpreted == viaCodegen)
  }

  test("dot_i64 is the exact zip-product sum, truncating to the shorter array") {
    val r = spark.sql(
      """SELECT
        |  dot_i64(array(2L, 3L, -4L), array(10L, 100L, 1000L)) AS full,
        |  dot_i64(array(2L, 3L), array(10L, 100L, 999999L)) AS trunc""".stripMargin)
      .collect().head
    assert(r.getLong(0) == 2 * 10 + 3 * 100 - 4 * 1000)
    assert(r.getLong(1) == 2 * 10 + 3 * 100)
  }

  test("null array elements propagate to NULL — never a silent 0 (ADVICE r12)") {
    // rproj_i64: a vector with a null component projects to NULL
    val p = spark.sql(
      s"""SELECT rproj_i64(array(CAST(0.5 AS DOUBLE), CAST(NULL AS DOUBLE)),
         |  ${Similarity.rprojSignsSql}) AS p""".stripMargin).collect().head
    assert(p.isNullAt(0), "rproj_i64 over a null element must be NULL")
    // dot_i64: null element inside the overlapped span → NULL; a null
    // beyond the shorter array's length is never read (truncation rule)
    val d = spark.sql(
      """SELECT
        |  dot_i64(array(2L, CAST(NULL AS BIGINT)), array(10L, 100L)) AS nullin,
        |  dot_i64(array(2L, 3L), array(10L, 100L, CAST(NULL AS BIGINT))) AS beyond""".stripMargin)
      .collect().head
    assert(d.isNullAt(0), "dot_i64 over a null element must be NULL")
    assert(d.getLong(1) == 2 * 10 + 3 * 100)
    // interpreted eval agrees with codegen on the null path
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType}
    val expr = graft.functions.RProjI64(
      Literal(new GenericArrayData(Array[Any](0.5, null)), ArrayType(DoubleType)),
      Literal(new GenericArrayData(Similarity.rprojSigns()
        .map(r => new GenericArrayData(r.map(x => x: Any)))),
        ArrayType(ArrayType(IntegerType))))
    assert(expr.eval(null) == null)
    // the signs side must carry non-null elements at analysis time
    val err = intercept[Exception] {
      spark.sql(
        """SELECT rproj_i64(array(CAST(0.5 AS DOUBLE)),
          |  array(array(CAST(NULL AS INT)))) AS p""".stripMargin).collect()
    }
    assert(err.getMessage.contains("rproj_i64"))
  }

  test("projection runs with no Exchange; projected top-k keeps recall vs exact") {
    val dir = "/root/testdata/sf0.001"
    graft.Engine.table(spark, dir, "embeddings").createOrReplaceTempView("embeddings")
    val projPlan = spark.sql(
      s"""SELECT vec_id, rproj_i64(transform(embedding, x -> CAST(x AS DOUBLE)),
         |  ${Similarity.rprojSignsSql}) AS pv FROM embeddings""".stripMargin)
      .queryExecution.executedPlan.toString
    assert(!projPlan.contains("Exchange"), "projection must be shuffle-free")

    // Recall on PLANTED near-dups (the EmbeddingWideSpec discipline): on
    // the synthetic corpus the float top-10 are near-ties among random
    // vectors (no real neighbor structure), so ranking overlap there
    // measures tie noise, not the projection. JL's guarantee is gap
    // preservation: a planted twin at cosine ~0.99 sits far above the
    // ~0.2 random background, and 16 dims must keep that separation.
    val rnd = new scala.util.Random(42)
    def normalize(v: Array[Double]) = { val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n) }
    def vec() = normalize(Array.fill(64)(rnd.nextGaussian()))
    val base = (0 until 200).map(i => (i.toLong + 100L, vec()))
    val queries = (0 until 8).map { i =>
      val noise = vec()
      (i.toLong, normalize(base(i)._2.zip(noise).map { case (a, b) => a + 0.15 * b }))
    }
    val tmp = java.nio.file.Files.createTempDirectory("graft_rproj_").toString
    import spark.implicits._
    (queries ++ base.map { case (id, v) => (id, v) })
      .map { case (id, v) => (id, v.map(_.toFloat).toSeq, 0) }
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val got = Similarity.rprojTopK(spark, tmp).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSeq
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
    val found = (0 until 8).count(i => got.getOrElse(i.toLong, Set.empty).contains(i + 100L))
    info(s"planted twin in projected top-10: $found/8")
    assert(found >= 7, s"JL projection lost planted near-dups: $found/8")

    // two-stage: the exact float re-rank must surface every planted twin
    // at rank 1 (cosine ~0.99 vs a ~0.2 random background) — the
    // shortlist only has to ADMIT the twin, the re-rank orders it.
    val top1 = Similarity.rprojRerank(spark, tmp).collect()
      .filter(_.getInt(3) == 1).map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact1 = (0 until 8).count(i => top1.get(i.toLong).contains(i + 100L))
    info(s"planted twin at re-ranked rank 1: $exact1/8")
    assert(exact1 == 8, s"re-rank missed planted twins: $exact1/8")
  }
}
