package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit pins for the codegen sketch kernels: generated-code results must
  * equal a straightforward Scala re-computation (the same arithmetic the
  * DuckDB oracles replay), including edge shapes the queries filter out.
  */
class SketchExpressionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("simhash60 equals the reference vote fold") {
    val hashes = Seq(0x5L, 0x6L, 0x7L, -1L)
    val got = Seq(hashes).toDF("hs")
      .selectExpr("simhash60(hs) AS fp").as[Long].head()
    val expected = {
      var fp = 0L
      for (j <- 0 until 60) {
        val votes = hashes.map(h => if (((h >>> j) & 1L) == 1L) 1 else -1).sum
        if (votes >= 0) fp |= (1L << j)
      }
      fp
    }
    assert(got == expected)
  }

  test("simhash60 of an empty array sets every bit (zero votes are >= 0)") {
    val got = Seq(Seq.empty[Long]).toDF("hs")
      .selectExpr("simhash60(hs) AS fp").as[Long].head()
    assert(got == (1L << 60) - 1)
  }

  test("minhash64 equals the affine-lane minima; empty array is all MaxValue") {
    val hashes = Seq(123456789L, -987654321L, 42L)
    val got = Seq(hashes).toDF("hs")
      .selectExpr("minhash64(transform(hs, x -> x)) AS mh")
      .as[Seq[Long]].head()
    assert(got.length == 64)
    val expected = (0 until 64).map { k =>
      val mul = (2L * k + 1L) * 0x9E3779B97F4A7C15L
      val inc = k * 0xBF58476D1CE4E5B9L
      hashes.map(h => h * mul + inc).min
    }
    assert(got == expected)
    val empty = Seq(Seq.empty[Long]).toDF("hs")
      .selectExpr("minhash64(hs) AS mh").as[Seq[Long]].head()
    assert(empty.forall(_ == Long.MaxValue))
  }

  test("hyperplane_sig sets bit p iff dot(v, plane_p) >= 0, in index order") {
    val v = Seq(1.0, -2.0, 0.5)
    val planes = Seq(
      Seq(1.0, 1.0, 1.0),   // dot = -0.5 -> bit 0 clear
      Seq(1.0, 0.0, 0.0),   // dot = 1.0  -> bit 1 set
      Seq(0.0, -1.0, 0.0))  // dot = 2.0  -> bit 2 set
    val got = Seq((v, planes)).toDF("v", "pm")
      .selectExpr("hyperplane_sig(v, pm) AS sig").as[Int].head()
    assert(got == 6)
  }

  test("jaccard_sorted merge-walks sorted sets; disjoint and identical edges") {
    val rows = Seq(
      (Seq("a", "b", "c"), Seq("b", "c", "d")),   // |∩|=2, |∪|=4
      (Seq("a"), Seq("b")),                        // disjoint
      (Seq("x", "y"), Seq("x", "y"))               // identical
    ).toDF("a", "b").selectExpr("jaccard_sorted(a, b) AS j").as[Double].collect()
    assert(rows(0) == 0.5 && rows(1) == 0.0 && rows(2) == 1.0)
  }

  test("containment_stats equals the array_intersect SQL spelling bit for bit") {
    val df = Seq(
      (Seq("a", "b", "c"), Seq("b", "c", "d", "e")), // |∩|=2: 2/3, 2/4
      (Seq("a"), Seq("b")),                          // disjoint: 0, 0
      (Seq("x", "y"), Seq("x", "y")),                // identical: 1, 1
      (Seq("p"), Seq("p", "q", "r"))                 // contained: 1, 1/3
    ).toDF("a", "b")
    val kernel = df.selectExpr(
      "containment_stats(a, b)[0] AS cab", "containment_stats(a, b)[1] AS cba",
      "containment_stats(a, b)[2] AS cmax").as[(Double, Double, Double)].collect()
    val sql = df.selectExpr(
      "CAST(size(array_intersect(a, b)) AS DOUBLE) / size(a) AS cab",
      "CAST(size(array_intersect(a, b)) AS DOUBLE) / size(b) AS cba",
      """greatest(CAST(size(array_intersect(a, b)) AS DOUBLE) / size(a),
        |         CAST(size(array_intersect(a, b)) AS DOUBLE) / size(b)) AS cmax""".stripMargin)
      .as[(Double, Double, Double)].collect()
    kernel.zip(sql).foreach { case (k, s) =>
      assert(java.lang.Double.doubleToRawLongBits(k._1) == java.lang.Double.doubleToRawLongBits(s._1))
      assert(java.lang.Double.doubleToRawLongBits(k._2) == java.lang.Double.doubleToRawLongBits(s._2))
      assert(java.lang.Double.doubleToRawLongBits(k._3) == java.lang.Double.doubleToRawLongBits(s._3))
    }
    // empty side → NULL, like the SQL spelling's x/0 under non-ANSI division
    val empty = Seq((Seq.empty[String], Seq("a"))).toDF("a", "b")
      .selectExpr("containment_stats(a, b) AS cs").collect()
    assert(empty.head.isNullAt(0))
  }

  test("containment_stats64 equals containment_stats on hashed sorted arrays") {
    val sets = Seq(
      (Seq("a", "b", "c"), Seq("b", "c", "d", "e")),
      (Seq("a"), Seq("b")),
      (Seq("x", "y"), Seq("x", "y")),
      (Seq("p"), Seq("p", "q", "r")))
    val df = sets.toDF("a", "b").selectExpr(
      "containment_stats(sort_array(a), sort_array(b)) AS cs",
      """containment_stats64(sort_array(transform(a, x -> xxhash64(x))),
        |                    sort_array(transform(b, x -> xxhash64(x)))) AS ch""".stripMargin)
    df.collect().foreach { r =>
      // no collisions among these elements → identical ratios, bit for bit
      assert(r.getSeq[Double](0) == r.getSeq[Double](1))
    }
    val empty = Seq((Seq.empty[Long], Seq(1L))).toDF("a", "b")
      .selectExpr("containment_stats64(a, b) AS ch").collect()
    assert(empty.head.isNullAt(0))
  }

  test("dot_product folds in index order from 0.0 (matches the SQL aggregate spelling)") {
    val df = Seq((Seq(1.5, -2.5, 3.25), Seq(2.0, 4.0, -1.0))).toDF("a", "b")
    val kernel = df.selectExpr("dot_product(a, b) AS d").as[Double].head()
    val sqlFold = df.selectExpr(
      "aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, p) -> acc + p) AS d")
      .as[Double].head()
    assert(java.lang.Double.doubleToRawLongBits(kernel) ==
      java.lang.Double.doubleToRawLongBits(sqlFold))
  }

  test("kernels agree between codegen'd projection and interpreted eval") {
    // Forcing an interpreted path: wrap in a filter over a non-codegen
    // context via RDD collect of the same expression on driver eval.
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val arr = new GenericArrayData(Array(11L, 22L, 33L))
    val evalFp = graft.functions.SimHash60(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        arr, org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)))
      .eval(null).asInstanceOf[Long]
    val dfFp = Seq(Seq(11L, 22L, 33L)).toDF("hs")
      .selectExpr("simhash60(hs) AS fp").as[Long].head()
    assert(evalFp == dfFp)
  }

  test("quant_stats equals the SQL higher-order spelling bit for bit") {
    // the kernel replaced five chained HOF lambdas in emb_quantize; this
    // pins the generated loop against that exact spelling, per element
    val vecs = Seq(
      Seq(0.5f, -1.25f, 3.75f, 0.0f),
      Seq(1e-4f, -1e-4f, 2e-4f),
      Seq(-7.5f))
    val df = vecs.toDF("v")
    val kernel = df.selectExpr("quant_stats(v) AS st")
      .selectExpr("st[0] AS scale", "st[1] AS max_err", "st[2] AS mse")
      .collect().map(_.toSeq)
    val hof = df
      .selectExpr("transform(v, x -> CAST(x AS DOUBLE)) AS d")
      .selectExpr("d", "array_max(transform(d, x -> abs(x))) AS maxabs")
      .where("maxabs > 0")
      .selectExpr("d", "maxabs",
        """transform(d, x -> greatest(CAST(-127 AS BIGINT), least(CAST(127 AS BIGINT),
          |CAST(floor(x * 127.0D / maxabs + 0.5D) AS BIGINT)))) AS qv""".stripMargin)
      .selectExpr("maxabs",
        "transform(sequence(0, size(d) - 1), i -> d[i] - qv[i] * maxabs / 127.0D) AS err")
      .selectExpr("maxabs / 127.0D AS scale",
        "array_max(transform(err, x -> abs(x))) AS max_err",
        "aggregate(err, CAST(0.0 AS DOUBLE), (a, x) -> a + x * x) / size(err) AS mse")
      .collect().map(_.toSeq)
    assert(kernel.toSeq == hof.toSeq)
  }

  test("quant_stats is NULL for empty and all-zero vectors") {
    val got = Seq(Seq.empty[Float], Seq(0.0f, 0.0f)).toDF("v")
      .selectExpr("quant_stats(v) AS st").collect()
    assert(got.forall(_.isNullAt(0)))
  }

  test("rep_stats equals the HOF spelling's integers (incl. duplicates and runs)") {
    val docs = Seq(
      Seq("a", "b", "a", "b", "a", "b"),          // repeating 3-grams
      Seq("x", "x", "x", "y", "z"),               // run of 3
      Seq("p", "q", "r"))                          // single 3-gram
    val df = docs.toDF("tokens")
    val kernel = df.selectExpr("rep_stats(tokens) AS st")
      .collect().map(_.getSeq[Long](0).toList)
    val hof = df.selectExpr(
        "CAST(size(tokens) AS BIGINT) AS nt",
        "CAST(size(tokens) - 2 AS BIGINT) AS n3",
        """CAST(size(array_distinct(transform(sequence(0, size(tokens)-3),
          |  i -> concat_ws(' ', tokens[i], tokens[i+1], tokens[i+2])))) AS BIGINT) AS n3d""".stripMargin,
        """CAST(aggregate(sort_array(tokens),
          |  named_struct('prev', '', 'run', 0, 'best', 0),
          |  (acc, x) -> named_struct(
          |    'prev', x,
          |    'run', IF(x = acc.prev, acc.run + 1, 1),
          |    'best', GREATEST(acc.best, IF(x = acc.prev, acc.run + 1, 1))),
          |  acc -> acc.best) AS BIGINT) AS topc""".stripMargin)
      .collect().map(r => List(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(kernel.toList == hof.toList)
  }
}
