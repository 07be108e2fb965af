package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards on the driver contract itself: a duplicate QueryDef name would
  * silently drop a query from the `queries` map (the correctness gate
  * would shrink without failing), and an oracle keyed to a missing query
  * would never run.
  */
class SparkEntrySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("query names are unique — the map loses nothing") {
    val names = SparkEntry.allDefs.map(_.name)
    val dupes = names.groupBy(identity).filter(_._2.size > 1).keys
    assert(dupes.isEmpty, s"duplicate query names: ${dupes.mkString(", ")}")
    assert(SparkEntry.queries.size == SparkEntry.allDefs.size)
  }

  test("every oracle belongs to a registered query") {
    val unknown = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"oracles without queries: ${unknown.mkString(", ")}")
  }

  test("every query declares an oracle (no silent rows-only downgrades)") {
    // No exceptions left (r12): evt_gapfill_series — the one rows-only
    // key of rounds 9-11 — now rides a per-user order-independent digest
    // oracle (VERDICT r11 #8), so every census key is hash-compared.
    // Anything appearing here is a silent downgrade and must fail.
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly.isEmpty,
      s"queries without oracles: ${rowsOnly.mkString(", ")}")
  }

  test("flagship entry returns rows on the smoke SF") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("emptiness contracts are exactly the documented allowlist") {
    // The vacuous-key guard (VERDICT r12 #1): a census key whose oracle
    // returns 0 rows proves only that both engines agree nothing
    // happened — twice now a green key turned out vacuous
    // (dedup_embedding_cosine_w in r11, ta_bm25* in r12). Verify warns
    // on any 0-row result outside this set; growing the set requires
    // editing THIS pin with the documented reason:
    //   op_except_empty    — customer ⊆ supplier nationkeys (containment)
    //   op_join_anti_empty — every customer has an order (full coverage)
    //   ta_bm25            — unigram idf zeroes on the stopword-dense
    //                        driver corpus (the suppression clause);
    //                        non-vacuous rankings live in ta_bm25_bigram
    assert(SparkEntry.emptinessContracts ==
      Set("op_except_empty", "op_join_anti_empty", "ta_bm25"))
  }
}
