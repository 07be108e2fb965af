package graft

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode

/** Monotonic, merge-by-tier persistence for the committed bench artifact
  * (`bench/BENCH_LOCAL.json`) — VERDICT r11 #1.
  *
  * The failure this prevents happened twice: an end-of-round run that
  * measured FEWER tiers (or measured them on a contended machine)
  * rewrote the whole artifact and destroyed the complete, clean-cal
  * evidence a previous run had committed — r11's snapshot replaced a
  * full sf0.1+sf1+sf10 artifact (cal 0.39/0.26/0.28) with an sf0.1+sf1
  * partial at cal 0.967, so HEAD stopped showing the round's own
  * headline fixes. Writes now go through [[merge]]:
  *
  *   - a tier section present in the OLD artifact but absent from the
  *     new run is carried forward verbatim — an interrupted or partial
  *     run can never delete measured evidence;
  *   - a tier section present in BOTH is replaced only when the new
  *     run's calibration constant for that tier is within
  *     `bound` (default 2×) of the old one — a contended run (cal blown
  *     up by co-tenants) keeps the old tier and logs why. If the
  *     machine legitimately slowed for good, delete the artifact file
  *     once; the guard compares against what's on disk, nothing else;
  *   - `errors` always reflects the CURRENT run (stale error text from
  *     a kept tier would be misattributed).
  *
  * The sf0.1 headline lives INLINE at the artifact's top level (the
  * shape every prior round's reader knows), so it is treated as one
  * pseudo-section guarded by the top-level `cal`.
  *
  * Jackson (on the Spark classpath) does the parsing; Bench still
  * assembles its sections as strings — merge happens at write time on
  * the parsed trees, so a kept section survives byte-for-byte.
  */
object BenchArtifact {
  private val mapper = new ObjectMapper()

  /** Top-level keys that together form the inline sf0.1 headline
    * section. `metric` is the fixed format marker and never moves. */
  private val headlineKeys =
    Seq("value", "unit", "cal", "queries", "pipeline", "floor",
      "scaling", "cellcal", "sf")

  private val fixedKeys = headlineKeys ++ Seq("metric", "errors")

  def parse(s: String): Option[ObjectNode] =
    try {
      mapper.readTree(s) match {
        case o: ObjectNode => Some(o)
        case _ => None
      }
    } catch { case _: Throwable => None }

  private def calOf(n: JsonNode): Option[Double] =
    Option(n.get("cal")).filter(_.isNumber).map(_.asDouble)

  /** Replacement is admissible when the incoming section's calibration
    * is within `bound`× of the section it would replace. A missing cal
    * on either side admits it (nothing to compare against). */
  private def calOk(neu: JsonNode, old: JsonNode, bound: Double): Boolean =
    (calOf(neu), calOf(old)) match {
      case (Some(nc), Some(oc)) => nc <= bound * oc
      case _ => true
    }

  /** Merge the assembled new-run artifact over the previously committed
    * one. `newJson` must be the complete single-object artifact the run
    * has measured SO FAR (Bench calls this after every tier). Returns
    * the JSON to persist. */
  def merge(oldJson: Option[String], newJson: String, bound: Double = 2.0,
      log: String => Unit = _ => ()): String = {
    val neuOpt = parse(newJson)
    val oldOpt = oldJson.flatMap(parse)
    if (neuOpt.isEmpty || oldOpt.isEmpty) return newJson
    val neu = neuOpt.get
    val old = oldOpt.get

    // inline sf0.1 headline
    val neuHas = neu.has("cal") && neu.has("queries")
    val oldHas = old.has("cal") && old.has("queries")
    if (oldHas && (!neuHas || !calOk(neu, old, bound))) {
      if (neuHas) log(s"[bench] merge: keeping sf0.1 headline from prior artifact " +
        s"(new cal ${calOf(neu).orNull} > ${bound}x old ${calOf(old).orNull})")
      headlineKeys.foreach { k =>
        if (old.has(k)) neu.set[JsonNode](k, old.get(k))
        else { val _ = neu.remove(k) }
      }
    }

    // named sections: tiers (objects with a cal) guarded by the cal
    // bound; evidence extras carried forward when the new run lacks them
    val names = old.fieldNames()
    while (names.hasNext) {
      val k = names.next()
      if (!fixedKeys.contains(k)) {
        if (!neu.has(k)) {
          log(s"[bench] merge: carrying $k forward from prior artifact")
          neu.set[JsonNode](k, old.get(k))
        } else if (neu.get(k).isObject && old.get(k).isObject &&
            !calOk(neu.get(k), old.get(k), bound)) {
          log(s"[bench] merge: keeping $k from prior artifact " +
            s"(new cal ${calOf(neu.get(k)).orNull} > ${bound}x old ${calOf(old.get(k)).orNull})")
          neu.set[JsonNode](k, old.get(k))
        }
      }
    }
    neu.toString
  }

  /** The committed per-cell seconds of one tier section — `"sf0.1"`
    * reads the inline headline, any other name a top-level object —
    * flattened over its `queries` and `pipeline` groups. Feeds the
    * outlier-retry rule. */
  def cellValues(artifact: Option[ObjectNode], tier: String): Map[String, Double] =
    artifact.flatMap { root =>
      val sec =
        if (tier == "sf0.1") Some(root: JsonNode)
        else Option(root.get(tier)).filter(_.isObject)
      sec.map { s =>
        Seq("queries", "pipeline").flatMap(g => numFields(s.get(g))).toMap
      }
    }.getOrElse(Map.empty)

  /** The committed low-core scaling cells of a tier (`scaling.queries`). */
  def scalingValues(artifact: Option[ObjectNode], tier: String): Map[String, Double] =
    artifact.flatMap { root =>
      val sec =
        if (tier == "sf0.1") Some(root: JsonNode)
        else Option(root.get(tier)).filter(_.isObject)
      sec.map(s => numFields(Option(s.get("scaling")).map(_.get("queries")).orNull).toMap)
    }.getOrElse(Map.empty)

  private def numFields(n: JsonNode): Seq[(String, Double)] =
    if (n == null || !n.isObject) Nil
    else {
      val b = Seq.newBuilder[(String, Double)]
      val it = n.fields()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue.isNumber) b += (e.getKey -> e.getValue.asDouble)
      }
      b.result()
    }

  /** The self-adjudication rule for the recurring "driver artifact vs
    * warm floor" outlier class (r9 minhash, r10 tfidf, r11 minhash/q10):
    * a cell whose fresh best-of-n lands over `factor`× its previously
    * COMMITTED value is suspect — contention, not plan cost — and earns
    * one extra attempt. The absolute floor keeps sub-second cells (where
    * 3× is scheduler noise, not an outlier) out of the retry path. */
  def needsRetry(name: String, measured: Double, prev: Map[String, Double],
      factor: Double = 3.0, floorSec: Double = 1.0): Boolean =
    measured > floorSec && prev.get(name).exists(p => measured > factor * p)
}
