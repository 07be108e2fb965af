package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins for the multi-round BPE trainer (ta_bpe_merges).
  *
  * The merge step is a delimiter-bounded two-pass string replace (see
  * TextAnalysis.bpeMerges); these tests pin exactly the properties the
  * census hash-compare relies on:
  *   - the bounded pattern never matches inside longer symbols,
  *   - two passes are exhaustive on alternating overlap chains,
  *   - same-symbol runs follow the declared replace-order policy,
  *   - end-to-end merges on testdata are deterministic with
  *     non-increasing argmax counts (the BPE monotonicity invariant).
  */
class BpeMergeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** Apply the production merge spelling (two bounded replaces) to one
    * delimiter-encoded symbol string. */
  private def merge(sym: String, a: String, b: String): String = {
    import spark.implicits._
    Seq(sym).toDF("sym")
      .selectExpr(
        s"replace(replace(sym, ' $a $b ', ' $a$b '), ' $a $b ', ' $a$b ') AS m")
      .collect()(0).getString(0)
  }

  test("bounded pattern cannot match inside longer symbols") {
    // "xa b" and "a bc" both contain the unbounded substring "a b" but
    // neither contains the bounded " a b " — no false merges.
    assert(merge(" xa b ", "a", "b") === " xa b ")
    assert(merge(" a bc ", "a", "b") === " a bc ")
    assert(merge(" a b c ", "a", "b") === " ab c ")
  }

  test("two passes are exhaustive on alternating overlap chains") {
    // Pass 1 merges the odd occurrences (each match consumes the next
    // occurrence's leading space); pass 2 catches the survivors, which
    // are never adjacent after a greedy pass.
    assert(merge(" a b a b ", "a", "b") === " ab ab ")
    assert(merge(" a b a b a b ", "a", "b") === " ab ab ab ")
    assert(merge(" a b a b a b a b ", "a", "b") === " ab ab ab ab ")
  }

  test("same-symbol runs follow the declared replace-order policy") {
    // Runs of 2-4 match strict leftmost pairing; the length-5 run is the
    // documented divergence (pass 1 takes occurrences 1 and 3-of-4
    // candidate positions) — pinned so a spelling change can't silently
    // move the contract.
    assert(merge(" a a ", "a", "a") === " aa ")
    assert(merge(" a a a ", "a", "a") === " aa a ")
    assert(merge(" a a a a ", "a", "a") === " aa aa ")
    assert(merge(" a a a a a ", "a", "a") === " aa a aa ")
  }

  test("merged symbols participate in later rounds") {
    assert(merge(" er s ", "er", "s") === " ers ")
    assert(merge(" m er g e ", "m", "er") === " mer g e ")
  }

  test("end-to-end merges on sf0.001: deterministic, counts non-increasing") {
    val rows = queries.TextAnalysis.bpeMerges(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    val rounds = rows.map(_.getInt(0)).toSeq
    assert(rounds === (1 to rows.length))
    val cnts = rows.map(_.getLong(2)).toSeq
    assert(cnts === cnts.sorted.reverse,
      s"argmax counts must be non-increasing across rounds: $cnts")
    val pairs = rows.map(_.getString(1)).toSeq
    assert(pairs.distinct.length === pairs.length, "a pair can merge once")
    // Every selected pair is two space-separated alphanumeric symbols.
    assert(pairs.forall(_.matches("[a-z0-9]+ [a-z0-9]+")))
    // Determinism: a second run returns bit-identical rows.
    val again = queries.TextAnalysis.bpeMerges(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.toSeq === again.toSeq)
  }
}
