package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing anchor selection (Schleimer et al., SIGMOD 2003) as ONE
  * codegen pass: `winnow_anchors(t, k, w)` returns the 62-bit
  * fingerprints of the distinct selected anchor POSITIONS of `t` — for
  * every window of `w` consecutive k-gram hashes, the minimum hash
  * (rightmost on ties, the robust-winnowing rule), deduplicated on the
  * selection order key (hash, position). The same k-gram selected at
  * multiple positions of a highly repetitive document therefore emits
  * its fingerprint once PER POSITION — fingerprints may repeat in the
  * output (ADVICE r11); downstream consumers group/countDistinct/join
  * on fp, for which repeats are harmless, and the DuckDB replay has the
  * identical per-position contract.
  *
  * This replaces the naive relational spelling of the same selection
  * (explode every gram position → per-position hash → doc-partitioned
  * window min → DISTINCT), which pays two corpus-proportional costs the
  * kernel eliminates: a per-position cryptographic hash (md5 was the
  * engine-portability spelling) and — worse at 100 TB — a doc-keyed
  * exchange+sort of EVERY position row (~16 bytes × n_chars rows ≈ 16×
  * corpus bytes through one shuffle) just to give the window function
  * its frame. Here selection happens inside the scan projection: the
  * only rows that ever leave the operator are the selected anchors,
  * ~2/(w+1) of positions.
  *
  * Engine portability is preserved by using exact integer arithmetic
  * instead of a seeded JVM hash: gram hashes are two MSB-first
  * polynomial hashes of the gram's bytes mod 2³¹ (B=131 and B=137 —
  * h(p) = Σ byte(p+j)·B^(k−1−j) mod 2³¹, computed rolling in O(1) per
  * position), the window-min order key is the same
  * h30·2³² + (2³²−1−pos) encoding as ta_winnow (min picks the smallest
  * 30-bit hash, ties the rightmost position; can never overflow), and
  * the match fingerprint widens to h1·2³¹+h2 (62 bits — a single 30-bit
  * field would birthday-collide on corpus-scale anchor counts). DuckDB
  * replays the identical formula with a precomputed power table —
  * WinnowKernelSpec pins kernel == the relational SQL spelling, and the
  * dedup_span_exact oracle is that replay. ASCII contract as ta_winnow:
  * byte positions == char positions (the corpus is pure ASCII; both
  * engines' substr/ord then agree with the kernel's byte walk).
  */
case class WinnowAnchors(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 1 && w >= 1, "winnow_anchors: k and w must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "winnow_anchors"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"winnow_anchors needs string, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      WinnowAnchors.compute(input.asInstanceOf[UTF8String].getBytes, k, w))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // The selection loop (rolling hashes + monotonic deque + dedup set)
    // is too stateful to inline profitably; the generated code calls the
    // same static kernel the interpreted path uses — still one virtual-
    // call-free invocation per row inside the whole-stage span, zero
    // per-element boxing.
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.WinnowAnchors.compute($c.getBytes(), $k, $w));
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object WinnowAnchors {

  /** Validated SQL-registry builder shared by both function registries
    * (GraftExtensions + GraftFunctions): the bare `exprs(1).eval()`
    * spelling threw IndexOutOfBounds on wrong arity and an opaque
    * ClassCast/unbound-eval error on non-literal k/w (ADVICE r11); k and
    * w parameterize generated code, so they MUST be plan-time integer
    * constants — reject anything else with a clear analysis-time error. */
  def build(exprs: Seq[Expression]): Expression = {
    if (exprs.length != 3)
      throw new IllegalArgumentException(
        s"winnow_anchors expects 3 arguments (text, k INT, w INT); got ${exprs.length}")
    def intLit(i: Int, name: String): Int = {
      val e = exprs(i)
      if (!e.foldable || e.dataType != IntegerType)
        throw new IllegalArgumentException(
          s"winnow_anchors: $name must be a foldable INT literal, got ${e.sql}")
      e.eval() match {
        case v: Int => v
        case _ => throw new IllegalArgumentException(
          s"winnow_anchors: $name must be a non-null INT literal")
      }
    }
    WinnowAnchors(exprs.head, intLit(1, "k"), intLit(2, "w"))
  }

  private val M31 = (1L << 31) - 1 // mask for mod 2^31
  private val M30 = (1L << 30) - 1 // 30-bit field inside the order key
  private val PosSpace = 1L << 32
  private val B1 = 131L
  private val B2 = 137L

  /** Distinct selected-anchor fingerprints of `bytes`, in first-selection
    * order. Empty when fewer than w gram positions exist (callers keep
    * the SQL-side length filter for plan clarity). Called from generated
    * code — must stay a static, allocation-lean method. */
  def compute(bytes: Array[Byte], k: Int, w: Int): Array[Long] = {
    val n = bytes.length - k + 1
    if (n < w) return Array.emptyLongArray
    // leading B^(k-1) mod 2^31 for the rolling subtract-shift step
    var pk1 = 1L; var pk2 = 1L
    var j = 0
    while (j < k - 1) { pk1 = (pk1 * B1) & M31; pk2 = (pk2 * B2) & M31; j += 1 }

    val m = new Array[Long](n) // order key: h30·2^32 + (2^32−1−pos)
    val fp = new Array[Long](n) // match key: h1·2^31 + h2
    var h1 = 0L; var h2 = 0L
    j = 0
    while (j < k) {
      val b = bytes(j) & 0xffL
      h1 = (h1 * B1 + b) & M31; h2 = (h2 * B2 + b) & M31
      j += 1
    }
    var p = 0
    while (p < n) {
      m(p) = (h1 & M30) * PosSpace + (PosSpace - 1 - (p + 1))
      fp(p) = h1 * (M31 + 1) + h2
      if (p + 1 < n) {
        val out = bytes(p) & 0xffL
        val in = bytes(p + k) & 0xffL
        h1 = ((h1 - out * pk1) * B1 + in) & M31
        h2 = ((h2 - out * pk2) * B2 + in) & M31
      }
      p += 1
    }

    // sliding min over windows [s, s+w): monotonic increasing deque of
    // indices (m values are distinct — the position field breaks ties)
    val deque = new Array[Int](n)
    var head = 0; var tail = 0 // [head, tail)
    val seen = new java.util.HashSet[Long]()
    val out = new java.util.ArrayList[java.lang.Long]()
    p = 0
    while (p < n) {
      while (tail > head && m(deque(tail - 1)) > m(p)) tail -= 1
      deque(tail) = p; tail += 1
      if (p >= w - 1) {
        while (deque(head) <= p - w) head += 1
        val sel = deque(head)
        if (seen.add(m(sel))) out.add(fp(sel))
      }
      p += 1
    }
    val res = new Array[Long](out.size)
    var i = 0
    while (i < res.length) { res(i) = out.get(i); i += 1 }
    res
  }
}
