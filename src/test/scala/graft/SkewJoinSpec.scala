package graft

import graft.operators.SkewJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("salted join equals plain join on a skewed dataset") {
    import spark.implicits._
    // 90% of probe rows hit one hot key
    val left = spark.range(0, 10000)
      .select((when(col("id") % 10 === 0, col("id") % 100).otherwise(7L)).as("k"),
        col("id").as("v"))
    val right = (0L until 100L).map(k => (k, s"dim_$k")).toDF("rk", "name")

    val plain = left.join(right, col("k") === col("rk"))
      .select(col("v"), col("name"))
      .collect().map(_.toString).sorted
    val salted = SkewJoin.saltedInnerJoin(left, right, "k", "rk", salt = 8)
      .select(col("v"), col("name"))
      .collect().map(_.toString).sorted
    assert(salted.sameElements(plain))
    assert(plain.length == 10000)
  }

  test("salted join drops unmatched keys like a plain inner join") {
    import spark.implicits._
    val left = Seq((1L, "a"), (2L, "b"), (99L, "zz")).toDF("k", "v")
    val right = Seq((1L, "x"), (2L, "y")).toDF("rk", "w")
    val got = SkewJoin.saltedInnerJoin(left, right, "k", "rk", salt = 4)
      .select(col("v"), col("w")).collect().map(_.toString).sorted
    assert(got.sameElements(Array("[a,x]", "[b,y]")))
  }
}
