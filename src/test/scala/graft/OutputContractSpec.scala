package graft

import org.apache.spark.sql.types.{ArrayType, DecimalType}
import org.scalatest.funsuite.AnyFunSuite

/** Locks in the two classes of silent driver-compare breakage found in
  * round 2:
  *
  *   - the driver's pandas path reads Spark DECIMAL columns as Decimal
  *     objects but DuckDB oracle decimals as float64 (trailing scale
  *     zeros survive one side only), and cannot sort/hash numpy arrays —
  *     so NO query output may carry a DECIMAL or ARRAY column;
  *   - Scala s-interpolation once turned a regex \b into a literal
  *     backspace inside an oracle, which "matched" vacuously — so no
  *     oracle SQL may contain control characters.
  */
class OutputContractSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("no query output carries a DECIMAL or ARRAY column") {
    val offenders = SparkEntry.allDefs.flatMap { d =>
      val bad = d.run(spark, sf).schema.fields.collect {
        case f if f.dataType.isInstanceOf[DecimalType] => s"${d.name}.${f.name}: decimal"
        case f if f.dataType.isInstanceOf[ArrayType] => s"${d.name}.${f.name}: array"
      }
      bad
    }
    assert(offenders.isEmpty, s"driver-compare-unsafe columns:\n${offenders.mkString("\n")}")
  }

  test("no oracle SQL contains control characters (the \\b-escape trap)") {
    val offenders = SparkEntry.oracleSql.collect {
      case (name, sql) if sql.exists(c => c < ' ' && c != '\n') =>
        val bad = sql.filter(c => c < ' ' && c != '\n').map(c => f"\\u${c.toInt}%04x").distinct
        s"$name: $bad"
    }
    assert(offenders.isEmpty, s"oracles with control chars:\n${offenders.mkString("\n")}")
  }
}
