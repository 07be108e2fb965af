package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Ports the reference's JSON golden tests
  * (/root/reference/tests/json/mod.rs) plus jsonpath selector edge cases
  * (jsonpath_utils.rs) against the custom Catalyst expressions.
  */
class JsonFunctionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def one(colExpr: org.apache.spark.sql.Column): String = {
    GraftFunctions.register(spark)
    val r = spark.range(1).select(colExpr.as("r")).collect()(0)
    if (r.isNullAt(0)) null else r.getString(0)
  }

  test("numeric selector on array: [1,2,3,4] -> $.1 = 2 (tests/json/mod.rs)") {
    assert(one(GraftFunctions.jsonExtract(lit("[1,2,3,4]"), "$.1")) == "2")
  }

  test("wildcard path wraps matches: [[1,2],[3,4],[5,6]] -> $.*.0 = [1,3,5]") {
    assert(one(GraftFunctions.jsonExtract(lit("[[1,2],[3,4],[5,6]]"), "$.*.0")) == "[1,3,5]")
  }

  test("wildcard with no matches yields empty array") {
    assert(one(GraftFunctions.jsonExtract(lit("5"), "$.*")) == "[]")
  }

  test("non-wildcard miss yields NULL") {
    assert(one(GraftFunctions.jsonExtract(lit("""{"a":1}"""), "$.b")) == null)
  }

  test("object key match is case-insensitive (jsonpath_utils.rs:114)") {
    assert(one(GraftFunctions.jsonExtract(lit("""{"Key":7}"""), "$.key")) == "7")
  }

  test("numeric selector on object matches stringified key (jsonpath_utils.rs:126)") {
    assert(one(GraftFunctions.jsonExtract(lit("""{"1":"x"}"""), "$[1]")) == "\"x\"")
  }

  test("json_unquote: string unquotes, non-strings render as json") {
    assert(one(call_function("json_unquote", lit("\"test\""))) == "test")
    assert(one(call_function("json_unquote", lit("[\"test\"]"))) == "[\"test\"]")
    assert(one(call_function("json_unquote", lit("123"))) == "123")
    assert(one(call_function("json_unquote", lit("null"))) == "null")
  }

  test("->> compound: extract then unquote") {
    assert(one(GraftFunctions.jsonExtractUnquote(
      lit("""{"a":"hello"}"""), "$.a")) == "hello")
  }

  test("bracket string selector with quotes") {
    assert(one(GraftFunctions.jsonExtract(lit("""{"a b":1}"""), """$["a b"]""")) == "1")
  }

  test("invalid path or invalid json yields NULL") {
    assert(one(GraftFunctions.jsonExtract(lit("""{"a":1}"""), "no-dollar")) == null)
    assert(one(GraftFunctions.jsonExtract(lit("{not json"), "$.a")) == null)
  }

  test("rolling_hash64 is deterministic, distinct, codegen-compatible") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq("a", "b", "abc", "abc", "").toDF("s")
      .select(col("s"), GraftFunctions.rollingHash64(col("s")).as("h"))
    val rows = df.collect()
    val h = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(h("abc") == ("abc".getBytes.foldLeft(0L)((a, b) => a * 1000003L + (b & 0xffL))))
    assert(h("a") != h("b"))
    // used over real data inside codegen
    val n = Engine.table(spark, "/root/testdata/sf0.001", "documents")
      .select(GraftFunctions.rollingHash64(col("text")).as("h"))
      .select(countDistinct(col("h"))).collect()(0).getLong(0)
    assert(n > 400)
  }
}
