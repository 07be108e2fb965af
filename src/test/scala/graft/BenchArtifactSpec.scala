package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench-artifact monotonicity rules (VERDICT r11 #1/#7,
  * per-cell per VERDICT r12 #2): tiers the new run lacks are carried
  * forward; tiers present in both merge CELL BY CELL keeping the faster
  * measurement (contention only inflates times, so min-over-runs is the
  * true floor — a deliberately contended run leaves every committed
  * cell's time unchanged or better and can only ADD evidence); totals
  * and floors are recomputed from the merged cells; the winning side's
  * cellcal stamp rides with its time; non-tier evidence extras min-merge
  * their timing leaves per leaf (VERDICT r13 #2 — the wholesale rule let
  * a contended run regress the committed nProbe sweep ~5×) while
  * deterministic leaves take the fresh value; and the per-cell
  * outlier-retry decision fires
  * exactly on the ">3× committed AND >1 s" class that produced the
  * r9/r10/r11 "driver artifact vs warm floor" adjudications. */
class BenchArtifactSpec extends AnyFunSuite {

  private val full =
    """{"metric":"total","value":0.4,"unit":"sec","cal":0.38,
      |"queries":{"q1_agg":0.4},"pipeline":{"dedup_minhash_lsh":0.8},
      |"floor":["q1_agg"],"cellcal":{"q1_agg":0.38,"dedup_minhash_lsh":0.4},
      |"scaling":{"cpus":8,"cal":0.3,"queries":{"q1_agg":0.5}},
      |"sf":"/root/testdata/sf0.1",
      |"sf1":{"dir":"d1","total":0.7,"cal":0.26,"queries":{"q1_agg":0.7},
      |  "pipeline":{"dedup_minhash_lsh":2.8},"floor":[],
      |  "cellcal":{"q1_agg":0.26,"dedup_minhash_lsh":0.27},
      |  "scaling":{"cpus":8,"cal":0.3,"queries":{"q1_agg":0.6}}},
      |"sf10":{"dir":"d10","total":1.4,"cal":0.28,"queries":{"q1_agg":1.4},
      |  "pipeline":{"dedup_minhash_lsh":6.3},"floor":[],
      |  "cellcal":{"q1_agg":0.28,"dedup_minhash_lsh":0.29},
      |  "scaling":{"cpus":8,"cal":0.26,"queries":{"q1_agg":4.1}}},
      |"ann_nprobe_sweep_sf1":{"p1":{"recall":0.2,"sec":0.3}},
      |"errors":{}}""".stripMargin.replace("\n", "")

  private def node(s: String) = BenchArtifact.parse(s).get

  test("a partial run carries the missing tiers forward instead of deleting them") {
    // the r11 failure shape: new run measured sf0.1 only (clean cal)
    val partial =
      """{"metric":"total","value":1.8,"unit":"sec","cal":0.25,
        |"queries":{"q1_agg":0.5},"pipeline":{"dedup_minhash_lsh":0.8},
        |"floor":[],"cellcal":{"q1_agg":0.25,"dedup_minhash_lsh":0.25},
        |"scaling":{"cpus":8,"cal":0.3,"queries":{"q1_agg":0.5}},
        |"sf":"/root/testdata/sf0.1","errors":{}}""".stripMargin.replace("\n", "")
    val merged = node(BenchArtifact.merge(Some(full), partial))
    assert(merged.get("cal").asDouble == 0.25) // the better machine constant
    assert(merged.has("sf1") && merged.has("sf10")) // tiers preserved
    assert(merged.get("sf10").get("cal").asDouble == 0.28)
    assert(merged.has("ann_nprobe_sweep_sf1")) // evidence extras preserved
    // the committed q1_agg 0.4 beats the fresh 0.5 — kept, stamp and all
    assert(merged.get("queries").get("q1_agg").asDouble == 0.4)
    assert(merged.get("cellcal").get("q1_agg").asDouble == 0.38)
  }

  test("a deliberately contended run leaves every committed cell unchanged or better") {
    val contended = full
      .replace("\"cal\":0.38", "\"cal\":0.97")
      .replace("\"queries\":{\"q1_agg\":0.4}", "\"queries\":{\"q1_agg\":1.3}")
      .replace("\"dedup_minhash_lsh\":0.8", "\"dedup_minhash_lsh\":2.9")
      .replace("\"total\":1.4,\"cal\":0.28,\"queries\":{\"q1_agg\":1.4}",
        "\"total\":4.2,\"cal\":0.9,\"queries\":{\"q1_agg\":4.2}")
      .replace("\"dedup_minhash_lsh\":6.3", "\"dedup_minhash_lsh\":19.0")
    var logged = List.empty[String]
    val merged = node(BenchArtifact.merge(Some(full), contended,
      log = m => logged ::= m))
    // every cell kept its committed (faster) time + stamp
    assert(merged.get("queries").get("q1_agg").asDouble == 0.4)
    assert(merged.get("pipeline").get("dedup_minhash_lsh").asDouble == 0.8)
    assert(merged.get("cellcal").get("q1_agg").asDouble == 0.38)
    assert(merged.get("sf10").get("queries").get("q1_agg").asDouble == 1.4)
    assert(merged.get("sf10").get("pipeline").get("dedup_minhash_lsh").asDouble == 6.3)
    // totals recomputed from the merged queries cells; cal keeps the min
    assert(merged.get("value").asDouble == 0.4)
    assert(merged.get("sf10").get("total").asDouble == 1.4)
    assert(merged.get("cal").asDouble == 0.38)
    assert(logged.exists(m => m.contains("q1_agg") && m.contains("keeps committed")))
  }

  test("faster fresh cells replace; slower ones lose — per cell, not per tier") {
    val mixed = full
      // q1_agg improved on a clean machine, minhash regressed (contention)
      .replace("\"queries\":{\"q1_agg\":0.4}", "\"queries\":{\"q1_agg\":0.3}")
      .replace("\"dedup_minhash_lsh\":0.8", "\"dedup_minhash_lsh\":1.6")
      .replace("\"cellcal\":{\"q1_agg\":0.38,\"dedup_minhash_lsh\":0.4}",
        "\"cellcal\":{\"q1_agg\":0.2,\"dedup_minhash_lsh\":0.55}")
    val merged = node(BenchArtifact.merge(Some(full), mixed))
    assert(merged.get("queries").get("q1_agg").asDouble == 0.3) // fresh wins
    assert(merged.get("pipeline").get("dedup_minhash_lsh").asDouble == 0.8) // committed wins
    // each kept time carries ITS OWN stamp
    assert(merged.get("cellcal").get("q1_agg").asDouble == 0.2)
    assert(merged.get("cellcal").get("dedup_minhash_lsh").asDouble == 0.4)
    assert(merged.get("value").asDouble == 0.3) // recomputed from merged queries
  }

  test("a cell the new run did not measure is carried forward inside its tier") {
    val fewer = full.replace(
      "\"queries\":{\"q1_agg\":1.4},",
      "\"queries\":{},")
    val merged = node(BenchArtifact.merge(Some(full), fewer))
    assert(merged.get("sf10").get("queries").get("q1_agg").asDouble == 1.4)
    assert(merged.get("sf10").get("cellcal").get("q1_agg").asDouble == 0.28)
  }

  test("scaling cells merge by the same min rule") {
    val slower = full.replace(
      "\"scaling\":{\"cpus\":8,\"cal\":0.3,\"queries\":{\"q1_agg\":0.5}}",
      "\"scaling\":{\"cpus\":8,\"cal\":0.9,\"queries\":{\"q1_agg\":1.5}}")
    val merged = node(BenchArtifact.merge(Some(full), slower))
    assert(merged.get("scaling").get("queries").get("q1_agg").asDouble == 0.5)
  }

  test("evidence extras min-merge timing leaves per leaf (the r13 sweep regression class)") {
    // the r13 failure shape: a contended run measured the sweep's sec
    // cells ~5x slower and the old wholesale rule committed them. Timing
    // leaves now keep the min; recall is deterministic so fresh wins.
    val contendedSweep = full.replace("{\"p1\":{\"recall\":0.2,\"sec\":0.3}}",
      "{\"p1\":{\"recall\":0.25,\"sec\":1.97}}")
    var logged = List.empty[String]
    val merged = node(BenchArtifact.merge(Some(full), contendedSweep,
      log = m => logged ::= m))
    val p1 = merged.get("ann_nprobe_sweep_sf1").get("p1")
    assert(p1.get("sec").asDouble == 0.3) // committed floor kept
    assert(p1.get("recall").asDouble == 0.25) // deterministic: fresh stands
    assert(logged.exists(m => m.contains("ann_nprobe_sweep_sf1/p1/sec")))

    // a faster fresh timing replaces the committed one
    val faster = full.replace("{\"p1\":{\"recall\":0.2,\"sec\":0.3}}",
      "{\"p1\":{\"recall\":0.2,\"sec\":0.22}}")
    val merged2 = node(BenchArtifact.merge(Some(full), faster))
    assert(merged2.get("ann_nprobe_sweep_sf1").get("p1").get("sec").asDouble == 0.22)
  }

  test("evidence extras carry forward leaves and nested points the new run lacks") {
    // an extras section measured with FEWER sweep points must not lose
    // the committed ones (interrupted run), and refresh-phase cells
    // min-merge by name
    val withRefresh = full.replace(
      "\"ann_nprobe_sweep_sf1\":{\"p1\":{\"recall\":0.2,\"sec\":0.3}}",
      "\"ann_nprobe_sweep_sf1\":{\"p1\":{\"recall\":0.2,\"sec\":0.3}," +
        "\"p2\":{\"recall\":0.4,\"sec\":0.42}}," +
        "\"ivm_bm25_refresh_sf1\":{\"init\":1.8,\"refresh\":1.7,\"probe\":0.9}")
    val partialNew = full.replace(
      "\"ann_nprobe_sweep_sf1\":{\"p1\":{\"recall\":0.2,\"sec\":0.3}}",
      "\"ann_nprobe_sweep_sf1\":{\"p1\":{\"recall\":0.2,\"sec\":0.29}}," +
        "\"ivm_bm25_refresh_sf1\":{\"init\":2.1,\"refresh\":0.4,\"probe\":1.2}")
    val merged = node(BenchArtifact.merge(Some(withRefresh), partialNew))
    val sweep = merged.get("ann_nprobe_sweep_sf1")
    assert(sweep.get("p1").get("sec").asDouble == 0.29) // fresh faster
    assert(sweep.get("p2").get("sec").asDouble == 0.42) // carried forward
    val r = merged.get("ivm_bm25_refresh_sf1")
    assert(r.get("init").asDouble == 1.8)    // committed faster
    assert(r.get("refresh").asDouble == 0.4) // fresh faster
    assert(r.get("probe").asDouble == 0.9)   // committed faster
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
