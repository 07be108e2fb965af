package graft

import graft.ivm.IncrementalExtremaView
import org.scalatest.funsuite.AnyFunSuite

/** The retraction cases that make extrema non-maintainable from scalar
  * state — and that the multiset state handles: deleting the current
  * minimum uncovers the NEXT one (unknowable from min alone), duplicate
  * extremes survive a single retraction, and a key retracted to empty
  * vanishes.
  */
class IvmExtremaSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def view(): IncrementalExtremaView = {
    val p = java.nio.file.Files
      .createTempDirectory("graft_ext_spec_").resolve("s").toString
    new IncrementalExtremaView(spark, Seq("k"), "v", p)
  }

  private def cur(v: IncrementalExtremaView): Map[String, (Double, Double)] =
    v.current().collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap

  test("retracting the current minimum uncovers the next; max unaffected") {
    val v = view()
    v.initialize(Seq(("a", 1.0), ("a", 5.0), ("a", 9.0)).toDF("k", "v"))
    assert(cur(v) == Map("a" -> (1.0, 9.0)))
    v.applyDelta(Seq(("a", 1.0, -1L)).toDF("k", "v", v.freqCol))
    assert(cur(v) == Map("a" -> (5.0, 9.0)))
  }

  test("duplicate extreme survives one retraction; second removes it") {
    val v = view()
    v.initialize(Seq(("a", 2.0), ("a", 2.0), ("a", 7.0)).toDF("k", "v"))
    v.applyDelta(Seq(("a", 2.0, -1L)).toDF("k", "v", v.freqCol))
    assert(cur(v) == Map("a" -> (2.0, 7.0)), "one copy of the min must remain")
    v.applyDelta(Seq(("a", 2.0, -1L)).toDF("k", "v", v.freqCol))
    assert(cur(v) == Map("a" -> (7.0, 7.0)))
  }

  test("distinct count retracts per VALUE: last copy removes it, duplicates don't") {
    val v = view()
    def dc(): Map[String, Long] = v.distinctCounts().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    v.initialize(Seq(("a", 1.0), ("a", 1.0), ("a", 5.0), ("b", 3.0)).toDF("k", "v"))
    assert(dc() == Map("a" -> 2L, "b" -> 1L))
    // one copy of a duplicated value retracts — still counted
    v.applyDelta(Seq(("a", 1.0, -1L)).toDF("k", "v", v.freqCol))
    assert(dc() == Map("a" -> 2L, "b" -> 1L))
    // the last copy retracts — the value leaves the distinct set
    v.applyDelta(Seq(("a", 1.0, -1L)).toDF("k", "v", v.freqCol))
    assert(dc() == Map("a" -> 1L, "b" -> 1L))
    // a key retracted to empty vanishes entirely
    v.applyDelta(Seq(("b", 3.0, -1L)).toDF("k", "v", v.freqCol))
    assert(dc() == Map("a" -> 1L))
  }

  test("streaming maintenance reaches the same extrema as batch applyDelta") {
    import org.apache.spark.sql.types._
    val v = view()
    v.initialize(Seq(("a", 1.0), ("a", 5.0), ("b", 2.0)).toDF("k", "v"))
    val deltaDir = java.nio.file.Files.createTempDirectory("graft_ext_stream_").toString
    Seq(("a", 1.0, -1L), ("b", 9.0, 1L)).toDF("k", "v", v.freqCol)
      .write.parquet(s"$deltaDir/d1")
    val schema = StructType(Seq(
      StructField("k", StringType), StructField("v", DoubleType),
      StructField(v.freqCol, LongType)))
    val q = v.maintainFrom(
      spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true").parquet(deltaDir))
    try {
      q.processAllAvailable()
      assert(cur(v) == Map("a" -> (5.0, 5.0), "b" -> (2.0, 9.0)))
    } finally q.stop()
  }

  test("a key retracted to empty vanishes; early retraction nets out") {
    val v = view()
    v.initialize(Seq(("a", 3.0), ("b", 4.0)).toDF("k", "v"))
    v.applyDelta(Seq(("b", 4.0, -1L), ("c", 8.0, -1L)).toDF("k", "v", v.freqCol))
    assert(cur(v) == Map("a" -> (3.0, 3.0)), "b gone, c's early retraction hidden")
    v.applyDelta(Seq(("c", 8.0, 2L)).toDF("k", "v", v.freqCol))
    assert(cur(v) == Map("a" -> (3.0, 3.0), "c" -> (8.0, 8.0)))
  }
}
