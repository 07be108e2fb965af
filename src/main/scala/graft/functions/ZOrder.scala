package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** 64-bit Morton (Z-order) interleave of two keys' low 32 bits: result
  * bit 2i is bit i of `left`, bit 2i+1 is bit i of `right`.
  *
  * Purpose is DATA LAYOUT, not lookup: sorting (repartitionByRange +
  * sortWithinPartitions) a table by `zorder64(a, b)` before the parquet
  * write makes every file's min/max footer stats tight on BOTH
  * dimensions at once, so a scan filtered on either key (or both) skips
  * files with plain parquet row-group pruning — the multi-dimensional
  * clustering trick table formats ship as OPTIMIZE ZORDER, here available
  * to any writer as one expression. At 100 TB this is the difference
  * between "filter on the secondary key reads everything" and "reads
  * O(matching cells)": a single-key sort clusters one dimension and
  * scatters the other; the z-curve bounds the span of both per file
  * (ZOrderSpec pins the span-shrink property).
  *
  * The interleave is the classic mask-spread (public-domain bit trick,
  * "Interleave bits by Binary Magic Numbers"): 5 shift-or-mask steps per
  * key, branch-free, inside whole-stage codegen. Reference analog: the
  * scalar-function extension point (functions/src/lib.rs:91-104), tier
  * (b) of the extension ladder.
  */
case class ZOrder64(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "zorder64"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"zorder64 needs (bigint, bigint), got $other")
    }

  @inline private def spread(v0: Long): Long = {
    var v = v0 & 0xFFFFFFFFL
    v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
    v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  override def nullSafeEval(x: Any, y: Any): Any =
    spread(x.asInstanceOf[Long]) | (spread(y.asInstanceOf[Long]) << 1)

  private def spreadJava(in: String, v: String): String =
    s"""
       |long $v = $in & 0xFFFFFFFFL;
       |$v = ($v | ($v << 16)) & 0x0000FFFF0000FFFFL;
       |$v = ($v | ($v << 8)) & 0x00FF00FF00FF00FFL;
       |$v = ($v | ($v << 4)) & 0x0F0F0F0F0F0F0F0FL;
       |$v = ($v | ($v << 2)) & 0x3333333333333333L;
       |$v = ($v | ($v << 1)) & 0x5555555555555555L;
     """.stripMargin

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val sx = ctx.freshName("sx")
      val sy = ctx.freshName("sy")
      s"""
         |${spreadJava(x, sx)}
         |${spreadJava(y, sy)}
         |${ev.value} = $sx | ($sy << 1);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
