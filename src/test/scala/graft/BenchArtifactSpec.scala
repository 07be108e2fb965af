package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench-artifact monotonicity rules (VERDICT r11 #1/#7): the
  * committed evidence file can only be replaced tier-by-tier, a
  * contended remeasurement (cal blown past 2× the committed tier's)
  * keeps the committed section, a tier the new run lacks is carried
  * forward, and the per-cell outlier-retry decision fires exactly on
  * the ">3× committed AND >1 s" class that produced the r9/r10/r11
  * "driver artifact vs warm floor" adjudications. */
class BenchArtifactSpec extends AnyFunSuite {

  private val full =
    """{"metric":"total","value":1.5,"unit":"sec","cal":0.38,
      |"queries":{"q1_agg":0.4},"pipeline":{"dedup_minhash_lsh":0.8},
      |"floor":["q1_agg"],"scaling":{"cpus":8,"cal":0.3,"queries":{"q1_agg":0.5}},
      |"sf":"/root/testdata/sf0.1",
      |"sf1":{"dir":"d1","total":3.6,"cal":0.26,"queries":{"q1_agg":0.7},
      |  "pipeline":{"dedup_minhash_lsh":2.8},"floor":[],
      |  "scaling":{"cpus":8,"cal":0.3,"queries":{"q1_agg":0.6}}},
      |"sf10":{"dir":"d10","total":10.4,"cal":0.28,"queries":{"q1_agg":1.4},
      |  "pipeline":{"dedup_minhash_lsh":6.3},"floor":[],
      |  "scaling":{"cpus":8,"cal":0.26,"queries":{"q1_agg":4.1}}},
      |"ann_nprobe_sweep_sf1":{"p1":{"recall":0.2,"sec":0.3}},
      |"errors":{}}""".stripMargin.replace("\n", "")

  private def node(s: String) = BenchArtifact.parse(s).get

  test("a partial run carries the missing tiers forward instead of deleting them") {
    // the r11 failure shape: new run measured sf0.1 only (clean cal)
    val partial =
      """{"metric":"total","value":1.8,"unit":"sec","cal":0.25,
        |"queries":{"q1_agg":0.5},"pipeline":{"dedup_minhash_lsh":0.8},
        |"floor":[],"scaling":{"cpus":8,"cal":0.3,"queries":{"q1_agg":0.5}},
        |"sf":"/root/testdata/sf0.1","errors":{}}""".stripMargin.replace("\n", "")
    val merged = node(BenchArtifact.merge(Some(full), partial))
    assert(merged.get("cal").asDouble == 0.25) // new headline won (cal fine)
    assert(merged.has("sf1") && merged.has("sf10")) // tiers preserved
    assert(merged.get("sf10").get("cal").asDouble == 0.28)
    assert(merged.has("ann_nprobe_sweep_sf1")) // evidence extras preserved
  }

  test("a contended tier remeasurement keeps the committed section") {
    val contended = full
      .replace("\"cal\":0.38", "\"cal\":0.97") // headline 2.55x worse
      .replace("\"total\":10.4,\"cal\":0.28", "\"total\":30.0,\"cal\":0.9") // sf10 3.2x worse
      .replace("\"value\":1.5", "\"value\":4.9")
    var logged = List.empty[String]
    val merged = node(BenchArtifact.merge(Some(full), contended,
      log = m => logged ::= m))
    assert(merged.get("cal").asDouble == 0.38) // committed headline kept
    assert(merged.get("value").asDouble == 1.5)
    assert(merged.get("sf10").get("total").asDouble == 10.4) // committed sf10 kept
    assert(merged.get("sf1").get("cal").asDouble == 0.26) // sf1 untouched either way
    assert(logged.exists(_.contains("sf10")))
  }

  test("a clean remeasurement within the cal bound replaces its tier") {
    val better = full
      .replace("\"total\":10.4,\"cal\":0.28", "\"total\":9.0,\"cal\":0.30")
    val merged = node(BenchArtifact.merge(Some(full), better))
    assert(merged.get("sf10").get("total").asDouble == 9.0)
  }

  test("no or unparseable committed artifact: the new run stands as-is") {
    assert(BenchArtifact.merge(None, full) == full)
    val merged = BenchArtifact.merge(Some("not json {"), full)
    assert(merged == full)
  }

  test("errors always reflect the current run, never a kept tier's") {
    val withErr = full.replace("\"errors\":{}",
      """"errors":{"q9@d10":"boom"}""")
    val merged = node(BenchArtifact.merge(Some(withErr),
      full.replace("\"cal\":0.38", "\"cal\":0.97")))
    assert(merged.get("errors").size == 0) // new run had none
  }

  test("cellValues/scalingValues flatten the committed per-cell seconds") {
    val art = BenchArtifact.parse(full)
    assert(BenchArtifact.cellValues(art, "sf0.1") ==
      Map("q1_agg" -> 0.4, "dedup_minhash_lsh" -> 0.8))
    assert(BenchArtifact.cellValues(art, "sf10") ==
      Map("q1_agg" -> 1.4, "dedup_minhash_lsh" -> 6.3))
    assert(BenchArtifact.scalingValues(art, "sf1") == Map("q1_agg" -> 0.6))
    assert(BenchArtifact.cellValues(art, "sf99").isEmpty)
    assert(BenchArtifact.cellValues(None, "sf0.1").isEmpty)
  }

  test("outlier retry fires on >3x committed above the 1s floor, and only then") {
    val prev = Map("dedup_minhash_lsh" -> 5.1, "q6_filter" -> 0.13)
    // the BENCH_r11 adjudication case: 17.9s against a committed 5.1s
    assert(BenchArtifact.needsRetry("dedup_minhash_lsh", 17.9, prev))
    assert(!BenchArtifact.needsRetry("dedup_minhash_lsh", 9.9, prev)) // <3x
    assert(!BenchArtifact.needsRetry("q6_filter", 0.9, prev)) // >3x but sub-second
    assert(!BenchArtifact.needsRetry("unknown_cell", 99.0, prev)) // no baseline
  }
}
