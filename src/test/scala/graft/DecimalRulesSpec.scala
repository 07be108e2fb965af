package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pins Spark's decimal arithmetic result types against the reference's
  * custom resolvers so the divergence is explicit and intentional:
  *
  *   reference `+` (add.rs:76-90): s = max(s1,s2),
  *     p = min(max(p1-s1, p2-s2) + s + 1, 28)   [cap 28, datatype.rs:22]
  *   Spark `+`: same formula but capped at 38.
  *
  *   reference caps: precision ≤ 28, scale ≤ 14; Spark: 38 / 38.
  *   Values agree wherever both representations hold the number — the
  *   engine-visible difference is only the declared type and overflow
  *   horizon (Spark's is strictly wider, i.e. a superset).
  */
class DecimalRulesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def typeOf(sql: String): DataType =
    spark.sql(s"SELECT $sql AS x").schema("x").dataType

  test("addition: same p/s formula as the reference below the cap") {
    // (10,2) + (10,2): s=2, p = max(8,8)+2+1 = 11 — both engines
    assert(typeOf("CAST(1.5 AS DECIMAL(10,2)) + CAST(2.5 AS DECIMAL(10,2))")
      == DecimalType(11, 2))
    // mixed scale: (10,2)+(8,4): s=4, p = max(8,4)+4+1 = 13
    assert(typeOf("CAST(1.5 AS DECIMAL(10,2)) + CAST(2.5 AS DECIMAL(8,4))")
      == DecimalType(13, 4))
  }

  test("multiplication: p1+p2+1, s1+s2 (Spark); reference uses the same shape") {
    assert(typeOf("CAST(1.5 AS DECIMAL(10,2)) * CAST(2.5 AS DECIMAL(8,1))")
      == DecimalType(19, 3))
  }

  test("division produces a widened, rounded decimal in Spark") {
    val t = typeOf("CAST(1 AS DECIMAL(10,2)) / CAST(3 AS DECIMAL(10,2))")
    val d = t.asInstanceOf[DecimalType]
    assert(d.scale >= 6, s"quotients carry >= 6 fractional digits, got $t")
  }

  test("precision cap divergence: 38 here vs 28 in the reference") {
    // (28,14) + (28,14) would saturate the reference's caps; Spark still
    // has headroom — documents that our numeric domain is a superset.
    assert(typeOf("CAST(1.5 AS DECIMAL(28,14)) + CAST(2.5 AS DECIMAL(28,14))")
      == DecimalType(29, 14))
  }

  test("int sum does not overflow at 32 bits (divergence: reference keeps i32)") {
    import spark.implicits._
    // reference sum(int) keeps i32 state and can overflow (sum.rs:11-160);
    // Spark widens to long — pinned here as intended behavior.
    val s = Seq(Int.MaxValue, Int.MaxValue, 10).toDF("v")
      .agg(sum(col("v"))).collect()(0).getLong(0)
    assert(s == 2L * Int.MaxValue + 10)
  }
}
