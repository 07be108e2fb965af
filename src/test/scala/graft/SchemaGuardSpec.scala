package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types.TimestampNTZType

/** Pins the schema-drift behavior VERDICT r8 asked for: when the driver
  * regenerates testdata with a new encoding, the FIRST table read must
  * fail with one line naming the table, the column, and found-vs-expected
  * — not 26 tests deep with a cryptic cast error — and every encoding the
  * driver has actually shipped (Long nanos through r7, timestamp[us] from
  * r8) must normalize to the same logical schema. */
class SchemaGuardSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_schemaguard_").toString

  test("current driver encoding (timestamp[us]) reads as TIMESTAMP_NTZ") {
    val ev = Engine.table(spark, sf, "events")
    assert(ev.schema("ts").dataType == TimestampNTZType)
  }

  test("legacy Long-nanos events files normalize to the same logical schema and values") {
    val dir = tmp()
    val ev = Engine.table(spark, sf, "events")
    // re-encode as the pre-r8 physical layout: ts stored as Long epoch-nanos
    ev.selectExpr("event_id",
        "unix_micros(CAST(ts AS TIMESTAMP)) * 1000L AS ts",
        "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val back = Engine.table(spark, dir, "events")
    assert(back.schema("ts").dataType == TimestampNTZType)
    val expect = ev.selectExpr("count(*)", "min(ts)", "max(ts)").head()
    val got = back.selectExpr("count(*)", "min(ts)", "max(ts)").head()
    assert(got == expect, "legacy nanos roundtrip changed the observable values")
  }

  test("an unsupported events.ts encoding fails in one line naming events.ts") {
    val dir = tmp()
    Engine.table(spark, sf, "events")
      .selectExpr("event_id", "CAST(unix_micros(CAST(ts AS TIMESTAMP)) AS DOUBLE) AS ts",
        "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val e = intercept[IllegalStateException](Engine.table(spark, dir, "events"))
    assert(e.getMessage.contains("events.ts"), s"error does not name the column: ${e.getMessage}")
  }

  test("a column drift on any table names the table, column, and found-vs-expected") {
    val dir = tmp()
    Engine.table(spark, sf, "documents")
      .selectExpr("doc_id", "text", "lang", "source", "CAST(n_chars AS INT) AS n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val e = intercept[IllegalStateException](Engine.table(spark, dir, "documents"))
    assert(e.getMessage.contains("documents") && e.getMessage.contains("n_chars") &&
      e.getMessage.contains("expected long") && e.getMessage.contains("found int"),
      s"unexpected drift message: ${e.getMessage}")
  }
}
