package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the stored rare-shingle index split (OPTIMIZATION r15 / VERDICT
  * r14 #4): the steady-state probe — candidate self-join + two-phase
  * verify served entirely from the written index — must reproduce the
  * in-session census key's pairs row for row, and the probe must not
  * depend on any session cache (caches dropped between write and probe,
  * the cold-start contract the bench split cell prices).
  */
class NgramIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("stored-index probe equals the in-session ngram-jaccard pairs") {
    val sf = "/root/testdata/sf0.01"
    val direct = queries.Dedup.ngramJaccardPairs(spark, sf)
      .collect().map(_.toString).toSeq
    val idx = Engine.scratchDir("graft_ngram_idxspec_") + "/index"
    queries.Dedup.writeNgramIndex(spark, sf, idx)
    Engine.clearSwapCaches(spark) // the probe serves from storage only
    val probe = queries.Dedup.probeNgramIndex(spark, idx)
      .collect().map(_.toString).toSeq
    assert(direct.nonEmpty, "gate corpus must produce pairs")
    assert(probe == direct)
    Engine.clearSwapCaches(spark)
  }
}
