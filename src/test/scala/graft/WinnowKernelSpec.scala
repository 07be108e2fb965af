package graft

import graft.functions.WinnowAnchors
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the `winnow_anchors` codegen kernel: the rolling-hash +
  * monotonic-deque implementation must equal (a) a brute-force
  * first-principles reference (direct O(n·k) hashing, linear-scan window
  * minima, global distinct) on random and adversarial strings, and
  * (b) the relational SQL spelling of the same selection (per-position
  * power-table hash, window min / min_by, DISTINCT) that the
  * dedup_span_exact DuckDB oracle replays — on the real sf0.001 corpus,
  * through both the codegen and interpreted expression paths.
  */
class WinnowKernelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val M31 = (1L << 31) - 1
  private val M30 = (1L << 30) - 1
  private val PosSpace = 1L << 32

  /** Direct-definition reference: no rolling update, no deque. */
  private def bruteForce(s: String, k: Int, w: Int): Seq[Long] = {
    val bytes = s.getBytes("UTF-8")
    val n = bytes.length - k + 1
    if (n < w) return Seq.empty
    def hash(b: Long, p: Int): Long =
      (0 until k).foldLeft(0L)((acc, j) => (acc * b + (bytes(p + j) & 0xffL)) & M31)
    val h1 = (0 until n).map(hash(131L, _))
    val h2 = (0 until n).map(hash(137L, _))
    val m = (0 until n).map(p => (h1(p) & M30) * PosSpace + (PosSpace - 1 - (p + 1)))
    val fp = (0 until n).map(p => h1(p) * (M31 + 1) + h2(p))
    val seen = scala.collection.mutable.LinkedHashSet[Long]()
    val out = scala.collection.mutable.ArrayBuffer[Long]()
    (0 to n - w).foreach { s0 =>
      val sel = (s0 until s0 + w).minBy(m)
      if (seen.add(m(sel))) out += fp(sel)
    }
    out.toSeq
  }

  test("kernel equals the brute-force definition on random strings of every small size") {
    val rnd = new scala.util.Random(7)
    (0 to 300).foreach { len =>
      val s = new String(Array.fill(len)(('a' + rnd.nextInt(26)).toChar))
      val got = WinnowAnchors.compute(s.getBytes("UTF-8"), 64, 16).toSeq
      val want = bruteForce(s, 64, 16)
      assert(got == want, s"len=$len: kernel $got != reference $want")
    }
  }

  test("kernel equals brute force on adversarial repetitive content (max tie pressure)") {
    // constant and short-period strings force equal 30-bit hashes in one
    // window — the rightmost-tie rule and the global distinct are the
    // only things separating anchors here
    Seq("a" * 200, "ab" * 100, "abc" * 70, ("xyz " * 60).trim).foreach { s =>
      val got = WinnowAnchors.compute(s.getBytes("UTF-8"), 64, 16).toSeq
      val want = bruteForce(s, 64, 16)
      assert(got == want, s"repetitive '${s.take(8)}…': $got != $want")
    }
  }

  test("kernel equals brute force at non-default (k, w) parameters") {
    val rnd = new scala.util.Random(11)
    val s = new String(Array.fill(500)(('a' + rnd.nextInt(26)).toChar))
    for (k <- Seq(1, 8, 16); w <- Seq(1, 4, 49)) {
      assert(WinnowAnchors.compute(s.getBytes("UTF-8"), k, w).toSeq == bruteForce(s, k, w),
        s"k=$k w=$w diverged")
    }
  }

  test("kernel output equals the relational SQL replay on the sf0.001 corpus") {
    // the exact spelling the DuckDB oracle runs, in Spark SQL — per-doc
    // multiset equality of anchor fingerprints proves the oracle
    // formulation and the kernel select the same anchors
    Engine.table(spark, "/root/testdata/sf0.001", "documents")
      .createOrReplaceTempView("documents")
    val pw = (b: Long) => {
      val up = (0 until 64).scanLeft(1L)((acc, _) => (acc * b) % (1L << 31))
      (0 until 64).map(j => up(64 - 1 - j)).mkString("array(", ", ", ")")
    }
    val hashSql = (t: String) =>
      s"""aggregate(transform(sequence(0, 63),
         |  j -> CAST(ascii(substring(t, CAST(p + j AS INT), 1)) AS BIGINT)
         |       * element_at($t, CAST(j + 1 AS INT))), 0L, (a, x) -> a + x)
         |  % ${1L << 31}""".stripMargin
    val relational = spark.sql(
      s"""WITH norm AS (
         |  SELECT doc_id, regexp_replace(lower(trim(text)), '\\\\s+', ' ') AS t
         |  FROM documents),
         |g0 AS (SELECT doc_id, t, length(t) - 63 AS n FROM norm WHERE length(t) >= 79),
         |h AS (
         |  SELECT doc_id, p, n, ${hashSql(pw(131L))} AS h1, ${hashSql(pw(137L))} AS h2
         |  FROM g0 LATERAL VIEW explode(sequence(1, n)) s AS p),
         |sel AS (
         |  SELECT doc_id, p, n,
         |    min(h1 % ${1L << 30} * ${1L << 32} + (${(1L << 32) - 1} - p)) OVER w AS m,
         |    min_by(h1 * ${1L << 31} + h2,
         |           h1 % ${1L << 30} * ${1L << 32} + (${(1L << 32) - 1} - p)) OVER w AS fp
         |  FROM h
         |  WINDOW w AS (PARTITION BY doc_id ORDER BY p
         |               ROWS BETWEEN CURRENT ROW AND 15 FOLLOWING))
         |SELECT DISTINCT doc_id, m, fp FROM sel WHERE p <= n - 15""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    val kernel = spark.sql(
      s"""SELECT doc_id, explode(winnow_anchors(t, 64, 16)) AS fp
         |FROM (SELECT doc_id, regexp_replace(lower(trim(text)), '\\\\s+', ' ') AS t
         |      FROM documents)
         |WHERE length(t) >= 79""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(kernel.nonEmpty && kernel == relational,
      "kernel anchors diverge from the relational/oracle spelling")
  }

  test("interpreted eval equals codegen output") {
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
    val expr = WinnowAnchors(BoundReference(0, org.apache.spark.sql.types.StringType,
      nullable = false), 64, 16)
    val rnd = new scala.util.Random(3)
    val s = new String(Array.fill(250)(('a' + rnd.nextInt(26)).toChar))
    val row = org.apache.spark.sql.catalyst.InternalRow(
      org.apache.spark.unsafe.types.UTF8String.fromString(s))
    val interpreted = expr.eval(row)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray.toSeq
    assert(interpreted == bruteForce(s, 64, 16),
      "interpreted eval diverges from the definition")
    // codegen path exercised via a real projection over a DataFrame
    import spark.implicits._
    val viaDf = Seq(s).toDF("t")
      .selectExpr("winnow_anchors(t, 64, 16) AS a")
      .collect()(0).getSeq[Long](0)
    assert(viaDf == interpreted, "codegen output diverges from interpreted eval")
  }
}
