package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
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

/** Per-document n-gram term frequencies in ONE codegen pass —
  * OPTIMIZATION r15 (guide §2.4 "remove shuffles outright", with problem
  * knowledge the optimizer lacks).
  *
  * `word_ngram_tfs(t, n)` returns `array<struct<token string, tf bigint>>`
  * — the distinct n-grams of [[WordNgrams]] with their in-document
  * occurrence counts, in first-occurrence order. Every posting builder
  * used to spell the (doc_id, token, tf) aggregate as
  * `explode(word_ngrams(...)) ... GROUP BY doc_id, token` — but `doc_id`
  * is unique per input ROW, so no (doc_id, token) group ever spans rows
  * and the aggregate's corpus-wide Exchange moves bytes only to combine
  * rows that were already co-located. The kernel counts inside the row:
  * `SELECT doc_id, inline(word_ngram_tfs(lower(text), n))` produces the
  * identical (doc_id, token, tf) bag with ZERO exchanges — measured at
  * sf10, the unigram posting aggregate is 2.5-3.2 s of which the
  * explode-only scan floor is ~1 s.
  *
  * Determinism: first-occurrence order (LinkedHashMap) — same input,
  * same array, so retried tasks reproduce their output exactly.
  * Equality with the aggregate spelling is pinned by WordNgramsSpec
  * (kernel tf ≡ GROUP BY count on edge shapes and the gate corpus);
  * every consumer's DuckDB oracle re-aggregates independently, so the
  * census hash compare re-proves it end to end.
  */
case class WordNgramTfs(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "word_ngram_tfs: n must be positive")

  override def dataType: DataType = WordNgramTfs.OutType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "word_ngram_tfs"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"word_ngram_tfs needs string, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    WordNgramTfs.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.WordNgramTfs.compute($c, $n);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object WordNgramTfs {

  private[functions] val OutType: DataType = ArrayType(
    StructType(Seq(
      StructField("token", StringType, nullable = false),
      StructField("tf", LongType, nullable = false))),
    containsNull = false)

  /** Validated SQL-registry builder (the WordNgrams discipline). */
  def build(exprs: Seq[Expression]): Expression = {
    if (exprs.length != 2)
      throw new IllegalArgumentException(
        s"word_ngram_tfs expects 2 arguments (text, n INT); got ${exprs.length}")
    val e = exprs(1)
    if (!e.foldable || e.dataType != IntegerType)
      throw new IllegalArgumentException(
        s"word_ngram_tfs: n must be a foldable INT literal, got ${e.sql}")
    val n = e.eval() match {
      case v: Int => v
      case _ => throw new IllegalArgumentException(
        "word_ngram_tfs: n must be a non-null INT literal")
    }
    WordNgramTfs(exprs.head, n)
  }

  /** (token, tf) structs of `s`'s n-grams, first-occurrence order.
    * Called from generated code. */
  def compute(s: UTF8String, n: Int): GenericArrayData = {
    val grams = WordNgrams.compute(s, n)
    if (grams.length == 0) return Empty
    val m = new java.util.LinkedHashMap[UTF8String, Array[Long]](grams.length * 2)
    var i = 0
    while (i < grams.length) {
      val prev = m.get(grams(i))
      if (prev == null) m.put(grams(i), Array(1L)) else prev(0) += 1L
      i += 1
    }
    val out = new Array[Any](m.size())
    val it = m.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val e = it.next()
      out(k) = new GenericInternalRow(Array[Any](e.getKey, e.getValue()(0)))
      k += 1
    }
    new GenericArrayData(out)
  }

  private val Empty = new GenericArrayData(new Array[Any](0))
}
