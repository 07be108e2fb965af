package graft

import graft.sources.MultisetStore
import org.scalatest.funsuite.AnyFunSuite

/** Laws of the freq-compacting multiset store, mirroring the reference's
  * write-time freq merge (storage/src/table.rs:309-347):
  *   - repeated inserts of a tuple merge into ONE stored row with summed
  *     freq (never physical duplication);
  *   - delete (freq −1) nets against inserts; a tuple retracted to zero
  *     compacts away entirely;
  *   - a retraction arriving BEFORE its insert (negative freq in state)
  *     nets out once the insert lands;
  *   - read expands freq copies.
  */
class MultisetStoreSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp() = java.nio.file.Files
    .createTempDirectory("graft_ms_spec_").resolve("t").toString

  test("inserts merge freq per tuple; snapshot holds one row per distinct tuple") {
    val p = tmp()
    val df = Seq((1, "a"), (2, "b")).toDF("k", "v")
    MultisetStore.append(spark, p, df)
    MultisetStore.append(spark, p, df)
    MultisetStore.append(spark, p, Seq((1, "a")).toDF("k", "v"))
    val snap = MultisetStore.snapshot(spark, p)
      .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(snap == Map((1, "a") -> 3L, (2, "b") -> 2L))
    // read expands the freq
    assert(MultisetStore.read(spark, p).count() == 5)
  }

  test("retraction to zero compacts the tuple away") {
    val p = tmp()
    MultisetStore.append(spark, p, Seq((1, "a"), (2, "b")).toDF("k", "v"))
    MultisetStore.append(spark, p, Seq((1, "a")).toDF("k", "v"), freq = -1L)
    val snap = MultisetStore.snapshot(spark, p)
      .collect().map(r => (r.getInt(0), r.getString(1))).toSet
    assert(snap == Set((2, "b")), "freq-0 tuple must not persist")
  }

  test("concurrent appends both land — the version race retries, never drops a delta") {
    val p = tmp()
    MultisetStore.append(spark, p, Seq((0, "base")).toDF("k", "v"))
    // two writers race from the same observed base; optimistic rename +
    // re-merge must serialize them with neither delta lost
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val writers = (1 to 4).map { i =>
      Future(MultisetStore.append(spark, p, Seq((i, s"w$i")).toDF("k", "v")))
    }
    Await.result(Future.sequence(writers), 120.seconds)
    val snap = MultisetStore.snapshot(spark, p)
      .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(snap == Map((0, "base") -> 1L, (1, "w1") -> 1L, (2, "w2") -> 1L,
      (3, "w3") -> 1L, (4, "w4") -> 1L))
    // every version directory is fully formed; no staging debris survives
    val entries = new java.io.File(p).list().toSeq
    assert(entries.forall(_.matches("v\\d+")), s"unexpected entries: $entries")
  }

  test("retraction before insert nets out (negative freq retained in state)") {
    val p = tmp()
    MultisetStore.append(spark, p, Seq((9, "z")).toDF("k", "v"), freq = -1L)
    // negative-freq tuple is stored but yields no rows
    assert(MultisetStore.snapshot(spark, p).count() == 1)
    assert(MultisetStore.read(spark, p).count() == 0)
    MultisetStore.append(spark, p, Seq((9, "z")).toDF("k", "v"), freq = 2L)
    assert(MultisetStore.read(spark, p).count() == 1)
  }
}
