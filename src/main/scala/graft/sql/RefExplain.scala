package graft.sql

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.types._

/** Reference-format EXPLAIN: renders a Catalyst logical plan as the
  * 4-column `tree | col_idx | datatype | expression` Values table the
  * reference produces (/root/reference/src/planner/src/explain/mod.rs:38-80,
  * node vocabulary explain/logical.rs:7-113), so EXPLAIN-based tests
  * written against the reference run unchanged here. Spark's own plan
  * stays available via `EXPLAIN FORMATTED`.
  *
  * The reference explains its *optimized* logical plan (its constant
  * folding goldens, tests/optimize/constant_folding.rs, show `1+2*3-4`
  * rendered as `3`). The honest Spark equivalent is the analyzed plan
  * with constant folding applied — Spark's FULL optimizer rewrites much
  * more aggressively (project collapsing, filter pushdown) and would
  * change the tree's shape away from the reference's.
  *
  * Documented divergences (pinned in ExplainGoldenSpec):
  *   - type names come from Spark's type system: decimal arithmetic
  *     widens per Spark's rules (1.0+2.0*3.0-4.0 is DECIMAL(7,2) here,
  *     DECIMAL(6,2) in the reference), and TEXT covers Spark's STRING
  *     (the reference's JSON type has no Spark analog — SURVEY §1.5).
  *   - operators with no reference analog (WINDOW, DISTINCT, …) render
  *     their Spark node name uppercased, tree-only.
  */
object RefExplain {

  def explain(spark: SparkSession, df: DataFrame): DataFrame = {
    val folded =
      org.apache.spark.sql.catalyst.optimizer.ConstantFolding(df.queryExecution.analyzed)
    val lines = scala.collection.mutable.ArrayBuffer.empty[Line]
    render(folded, lines, new Padding, nameSuffix = "")
    val schema = StructType(Seq("tree", "col_idx", "datatype", "expression")
      .map(StructField(_, StringType, nullable = false)))
    spark.createDataFrame(
      new java.util.ArrayList[Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(
          lines.toSeq.map(l => Row(l.tree, l.idx, l.dt, l.expr))).asJava),
      schema)
  }

  private case class Line(tree: String, idx: String, dt: String, expr: String)

  /** Mirror of the reference's push/pop padding helper (mod.rs:219-242). */
  private final class Padding {
    private val pads = scala.collection.mutable.ArrayBuffer.empty[String]
    def push(p: String): Unit = pads += p
    def pop(): Unit = pads.remove(pads.length - 1)
    override def toString: String = pads.mkString
  }

  // --- node rendering -----------------------------------------------------

  private def render(p: LogicalPlan, out: scala.collection.mutable.ArrayBuffer[Line],
      pad: Padding, nameSuffix: String): Unit = p match {
    // alias layers: reference TableAlias renders "{child}({alias})" and
    // delegates every section to the child (explain/logical.rs:20-22);
    // Spark's analyzer-generated subquery names are invisible there.
    case SubqueryAlias(id, child) if id.name.startsWith("__auto") =>
      render(child, out, pad, nameSuffix)
    case SubqueryAlias(id, child) =>
      // nested aliases: the OUTERMOST name wins, matching the reference
      // where re-aliasing replaces the TableAlias rather than stacking
      val suffix = if (nameSuffix.nonEmpty) nameSuffix else s"(${id.name})"
      render(child, out, pad, suffix)
    case v: View => render(v.child, out, pad, nameSuffix)

    // a NAMED local relation is a resolved catalog object (system tables,
    // DataFrame-registered views) — the reference renders those as TABLE
    // with a column list; only anonymous VALUES render as VALUES
    case l: LocalRelation if nameSuffix.nonEmpty =>
      node(out, pad, s"TABLE$nameSuffix") {
        out += Line(s"${pad}columns:", "", "", "")
        pad.push("  ")
        l.output.zipWithIndex.foreach { case (a, i) =>
          out += Line(s"$pad${a.name}", i.toString, typeName(a.dataType), "")
        }
        pad.pop()
      }

    case Project(list, child) =>
      node(out, pad, s"PROJECT$nameSuffix") {
        outputExprs(out, pad, list, child.output)
        source(out, pad, "source", child)
      }
    case Aggregate(keys, aggs, child, _) =>
      node(out, pad, s"GROUP$nameSuffix") {
        outputExprs(out, pad, aggs, child.output)
        if (keys.nonEmpty) {
          out += Line(s"${pad}group_keys:", "", "", "")
          // reference renders group keys at the same padding, expr-only
          // (mod.rs:180-189 — no extra indent push)
          keys.foreach { k =>
            out += Line(pad.toString, "", typeName(k.dataType), renderExpr(k, child.output))
          }
        }
        source(out, pad, "source", child)
      }
    case Filter(cond, child) =>
      node(out, pad, s"FILTER$nameSuffix") {
        out += Line(s"${pad}predicate:", "", "", "")
        out += Line(pad.toString, "", typeName(cond.dataType), renderExpr(cond, child.output))
        source(out, pad, "source", child)
      }
    case Sort(order, _, child, _) =>
      node(out, pad, s"SORT$nameSuffix") {
        out += Line(s"${pad}sort_exprs:", "", "", "")
        pad.push("  ")
        order.foreach { so =>
          val dir = so.direction.sql // ASC / DESC
          out += Line(pad.toString, "", typeName(so.child.dataType),
            s"${renderExpr(so.child, child.output)} ($dir)")
        }
        pad.pop()
        source(out, pad, "source", child)
      }
    case _: GlobalLimit | _: Offset =>
      val (limit, offset, child) = peelLimit(p, -1L, 0L)
      node(out, pad, s"LIMIT$nameSuffix") {
        out += Line(s"${pad}limit: $limit", "", "", "")
        out += Line(s"${pad}offset: $offset", "", "", "")
        source(out, pad, "source", child)
      }
    case LocalLimit(_, child) => render(child, out, pad, nameSuffix)
    case u: Union =>
      node(out, pad, s"UNION_ALL$nameSuffix") {
        u.children.zipWithIndex.foreach { case (c, i) => source(out, pad, s"source_$i", c) }
      }
    case j: Join =>
      node(out, pad, s"JOIN$nameSuffix") {
        j.condition.foreach { cond =>
          out += Line(s"${pad}predicate:", "", "", "")
          out += Line(pad.toString, "", typeName(cond.dataType),
            renderExpr(cond, j.left.output ++ j.right.output))
        }
        source(out, pad, "left", j.left)
        source(out, pad, "right", j.right)
      }
    case _: OneRowRelation =>
      node(out, pad, s"SINGLE$nameSuffix") {}
    case _: LocalRelation =>
      node(out, pad, s"VALUES$nameSuffix") {}
    case r if r.children.isEmpty =>
      // leaf relation (parquet scan, catalog table): TABLE + column list
      node(out, pad, s"TABLE$nameSuffix") {
        if (r.output.nonEmpty) {
          out += Line(s"${pad}columns:", "", "", "")
          pad.push("  ")
          r.output.zipWithIndex.foreach { case (a, i) =>
            out += Line(s"$pad${a.name}", i.toString, typeName(a.dataType), "")
          }
          pad.pop()
        }
      }
    case other =>
      // no reference analog (WINDOW, DISTINCT, …): Spark node name, tree-only
      node(out, pad, s"${other.nodeName.toUpperCase}$nameSuffix") {
        other.children.zipWithIndex.foreach { case (c, i) =>
          val label = if (other.children.length == 1) "source" else s"source_$i"
          source(out, pad, label, c)
        }
      }
  }

  private def node(out: scala.collection.mutable.ArrayBuffer[Line], pad: Padding,
      name: String)(body: => Unit): Unit = {
    out += Line(s"$pad$name", "", "", "")
    pad.push(" |")
    body
    pad.pop()
  }

  private def source(out: scala.collection.mutable.ArrayBuffer[Line], pad: Padding,
      label: String, child: LogicalPlan): Unit = {
    out += Line(s"$pad$label:", "", "", "")
    pad.push("  ")
    render(child, out, pad, "")
    pad.pop()
  }

  private def outputExprs(out: scala.collection.mutable.ArrayBuffer[Line], pad: Padding,
      list: Seq[NamedExpression], childOutput: Seq[Attribute]): Unit = {
    if (list.isEmpty) return
    out += Line(s"${pad}output_exprs:", "", "", "")
    pad.push("  ")
    list.zipWithIndex.foreach { case (ne, i) =>
      out += Line(s"$pad${outName(ne, i)}", i.toString, typeName(ne.dataType),
        renderExpr(ne, childOutput))
    }
    pad.pop()
  }

  @annotation.tailrec
  private def peelLimit(p: LogicalPlan, l: Long, o: Long): (Long, Long, LogicalPlan) =
    p match {
      case GlobalLimit(Literal(n: Int, _), c) => peelLimit(c, n.toLong, o)
      case Offset(Literal(n: Int, _), c) => peelLimit(c, l, n.toLong)
      case LocalLimit(_, c) => peelLimit(c, l, o)
      case other => (l, o, other)
    }

  // --- expression rendering ----------------------------------------------

  private val identOk = "^[A-Za-z_][A-Za-z0-9_]*$".r

  /** Output column naming: user aliases survive; analyzer-generated names
    * (pretty-printed SQL like `count(1)` or `((1 + (2 * 3)) - 4)`, never
    * plain identifiers) become `_colN` — the reference's convention for
    * unaliased select items (its goldens name `count(*)` `_col1`). */
  private def outName(ne: NamedExpression, pos: Int): String =
    if (identOk.matches(ne.name)) ne.name else s"_col${pos + 1}"

  /** Reference Expression Display (ast/src/expr.rs:203-250): compiled
    * column references render `<OFFSET n>`, function calls render
    * `name(args)` with non-identifier names backtick-quoted, casts render
    * `CAST(e AS T)`, constants render typed. */
  private def renderExpr(e: Expression, childOutput: Seq[Attribute]): String = e match {
    case Alias(c, _) => renderExpr(c, childOutput)
    case a: AttributeReference =>
      val i = childOutput.indexWhere(_.exprId == a.exprId)
      if (i >= 0) s"<OFFSET $i>" else a.name
    case l: Literal => renderLiteral(l)
    case c: Cast => s"CAST(${renderExpr(c.child, childOutput)} AS ${typeName(c.dataType)})"
    case ae: AggregateExpression =>
      ae.aggregateFunction match {
        case Count(Seq(Literal(1, _))) | Count(Seq()) => "count()"
        case f => call(f.prettyName, f.children.map(renderExpr(_, childOutput)))
      }
    // infix operators render as their symbol, backtick-quoted when not a
    // plain identifier — the reference's FunctionCall display for `+`,
    // `<`, etc. (ast/src/expr.rs:209,217-221)
    case b: BinaryOperator =>
      call(b.symbol, Seq(renderExpr(b.left, childOutput), renderExpr(b.right, childOutput)))
    case other => call(other.prettyName, other.children.map(renderExpr(_, childOutput)))
  }

  private def call(name: String, args: Seq[String]): String = {
    val n = if (identOk.matches(name)) name else s"`$name`"
    s"$n(${args.mkString(", ")})"
  }

  private def renderLiteral(l: Literal): String = l.value match {
    case null => "NULL"
    case _ => l.dataType match {
      case _: DecimalType | ByteType | ShortType | IntegerType | LongType |
           DoubleType | FloatType => l.value.toString
      case BooleanType => l.value.toString.toUpperCase
      case _ => "\"" + l.value.toString + "\""
    }
  }

  /** Spark → reference type names (data/src/datatype.rs:43-58). Spark's
    * STRING covers the reference's TEXT/JSON/JSONPATH (SURVEY §1.5). */
  private def typeName(dt: DataType): String = dt match {
    case StringType => "TEXT"
    case IntegerType => "INTEGER"
    case LongType => "BIGINT"
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    case BooleanType => "BOOLEAN"
    case BinaryType => "BYTEA"
    case DateType => "DATE"
    case TimestampType | TimestampNTZType => "TIMESTAMP"
    case NullType => "NULL"
    case other => other.sql
  }
}
