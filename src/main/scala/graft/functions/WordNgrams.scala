package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-grams of a single-space-tokenized string in ONE codegen pass —
  * OPTIMIZATION r14 (guide §1.2 per-task work / "eliminate non-codegen
  * expressions in the hot path").
  *
  * `word_ngrams(t, n)` ≡ the higher-order-function spelling every posting
  * builder used, token for token:
  *   - n=1: `filter(split(t, ' '), x -> x <> '')`
  *   - n=2: `CASE WHEN size(tk) < 2 THEN array() ELSE
  *           zip_with(slice(tk,1,size-1), slice(tk,2,size-1),
  *                    (a,b) -> concat(a,' ',b)) END`
  *   - n=3: `transform(sequence(0, size-3), i -> concat(tk[i],' ',tk[i+1],' ',tk[i+2]))`
  * where `tk` is the n=1 result. Those spellings pay one INTERPRETED
  * lambda invocation per token per stage (split allocates the
  * empty-string fragments, filter re-walks them, zip_with/transform
  * allocate slices and per-element concats) — on the corpus pass that is
  * the single hottest expression chain in the text pipeline. The kernel
  * walks the string's UTF-8 bytes once: a token is a maximal run of
  * non-0x20 bytes (identical to split-on-' ' + drop-empties, and 0x20
  * never occurs inside a multi-byte UTF-8 sequence, so the byte walk is
  * exact for ANY input), and each n-gram is one byte-copy of its token
  * run joined by single spaces. Case folding stays OUTSIDE the kernel
  * (call sites pass `lower(text)`, Spark's codegen'd Lower), so the
  * kernel composes rather than re-implementing collation.
  *
  * Fewer than n tokens → empty array (the CASE/sequence guards' exact
  * contract). NULL input → NULL. WordNgramsSpec pins kernel ≡ each HOF
  * spelling on edge shapes (empty, all-spaces, repeated spaces, unicode,
  * fewer-than-n tokens); every consumer's DuckDB oracle re-proves the
  * tokenization end to end, since the oracles tokenize independently.
  */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "word_ngrams: n must be positive")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "word_ngrams"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"word_ngrams needs string, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      WordNgrams.compute(input.asInstanceOf[UTF8String], n))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // Token scanning + byte assembly is branchy; the generated code calls
    // the same static kernel the interpreted path uses (the WinnowAnchors
    // pattern): one virtual-call-free invocation per row inside the
    // whole-stage span, zero per-element lambda dispatch or boxing.
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.WordNgrams.compute($c, $n));
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object WordNgrams {

  /** Validated SQL-registry builder (the WinnowAnchors discipline): `n`
    * parameterizes generated code, so it must be a plan-time INT literal
    * — reject anything else with a clear analysis-time error. */
  def build(exprs: Seq[Expression]): Expression = {
    if (exprs.length != 2)
      throw new IllegalArgumentException(
        s"word_ngrams expects 2 arguments (text, n INT); got ${exprs.length}")
    val e = exprs(1)
    if (!e.foldable || e.dataType != IntegerType)
      throw new IllegalArgumentException(
        s"word_ngrams: n must be a foldable INT literal, got ${e.sql}")
    val n = e.eval() match {
      case v: Int => v
      case _ => throw new IllegalArgumentException(
        "word_ngrams: n must be a non-null INT literal")
    }
    WordNgrams(exprs.head, n)
  }

  /** All n-grams of the maximal non-space byte runs of `s`, each joined
    * by single 0x20 bytes. Called from generated code — static and
    * allocation-lean (one output UTF8String per n-gram, no per-token
    * objects). */
  def compute(s: UTF8String, n: Int): Array[UTF8String] = {
    val bytes = s.getBytes
    val len = bytes.length
    // pass 1: token boundaries
    var t = 0
    var i = 0
    while (i < len) {
      if (bytes(i) != ' ') {
        t += 1
        while (i < len && bytes(i) != ' ') i += 1
      } else i += 1
    }
    if (t < n) return EmptyArray
    val starts = new Array[Int](t)
    val ends = new Array[Int](t)
    var k = 0
    i = 0
    while (i < len) {
      if (bytes(i) != ' ') {
        starts(k) = i
        while (i < len && bytes(i) != ' ') i += 1
        ends(k) = i
        k += 1
      } else i += 1
    }
    val out = new Array[UTF8String](t - n + 1)
    var g = 0
    while (g < out.length) {
      var gl = n - 1 // the joining spaces
      var j = 0
      while (j < n) { gl += ends(g + j) - starts(g + j); j += 1 }
      val buf = new Array[Byte](gl)
      var pos = 0
      j = 0
      while (j < n) {
        if (j > 0) { buf(pos) = ' '; pos += 1 }
        val l = ends(g + j) - starts(g + j)
        System.arraycopy(bytes, starts(g + j), buf, pos, l)
        pos += l
        j += 1
      }
      out(g) = UTF8String.fromBytes(buf)
      g += 1
    }
    out
  }

  private val EmptyArray = new Array[UTF8String](0)
}
