package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the trigram stupid-backoff LM filter (pipeline_lm_ppl):
  *   1. a planted corpus whose counts fit in a comment reproduces the
  *      hand-computed flog2 arithmetic for each backoff arm — including
  *      the "an exact copy of a training doc scores ZERO surprisal"
  *      boundary;
  *   2. on the real gate corpus all three arms fire (the non-vacuity
  *      the n3/n2/n1 tallies exist to prove) and the keep rule is the
  *      integer comparison it claims to be.
  */
class LmPplSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("planted corpus: each backoff arm reproduces the hand-computed flog2 value") {
    // Train half (even ids): doc 0 = "a b c d".
    //   trigram counts: {a b c: 1, b c d: 1}; bigrams {a b, b c, c d: 1};
    //   unigrams {a,b,c,d: 1}; N = 4, V = 4, f(1) = 0, f(8) = 196608.
    // Score half (odd ids):
    //   doc 1 "a b c d" — both contexts hit the trigram arm with
    //     c3 = c2(x,v) = 1: surp = -(f(1) - f(1)) = 0. A verbatim copy
    //     of a training doc is a perfect fit: sur = 0, bits = 0.
    //   doc 3 "q r s" — trigram and bigram unseen, u = 's' OOV:
    //     surp = -(2·log04 + f(0+1) - f(N+V)) = 163840 + 196608 = 360448
    //     → bits = 360448/65536 = 5.5.
    //   doc 5 "x b c" — trigram unseen, bigram "b c" seen (c2 = 1,
    //     c1(b) = 1): surp = -(log04 + f(1) - f(1)) = 81920 → bits 1.25.
    import spark.implicits._
    Seq((0L, "a b c d"), (1L, "a b c d"), (3L, "q r s"), (5L, "x b c"))
      .toDF("doc_id", "text").createOrReplaceTempView("documents")
    val rows = queries.Curate.lmPplOver(spark).collect()
      .map(r => r.getLong(0) -> r).toMap
    val d1 = rows(1L)
    assert((d1.getLong(1), d1.getLong(2), d1.getLong(3), d1.getLong(4),
      d1.getLong(5), d1.getDouble(6), d1.getInt(7)) == ((2L, 2L, 0L, 0L, 0L, 0.0, 1)),
      s"train-copy doc: $d1")
    val d3 = rows(3L)
    assert((d3.getLong(1), d3.getLong(4), d3.getLong(5), d3.getDouble(6)) ==
      ((1L, 1L, 360448L, 5.5)), s"OOV doc: $d3")
    val d5 = rows(5L)
    assert((d5.getLong(1), d5.getLong(3), d5.getLong(5), d5.getDouble(6)) ==
      ((1L, 1L, 81920L, 1.25)), s"bigram-backoff doc: $d5")
  }

  test("gate corpus: all three arms fire; keep is the integer rule; sur >= 0") {
    val df = queries.Curate.lmPpl(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.nonEmpty)
    val (n3, n2, n1) = rows.foldLeft((0L, 0L, 0L)) { case ((a, b, c), r) =>
      (a + r.getLong(2), b + r.getLong(3), c + r.getLong(4))
    }
    assert(n3 > 0 && n2 > 0 && n1 > 0,
      s"a backoff arm never fired on the held-out half: n3=$n3 n2=$n2 n1=$n1 " +
        "(the corpus drifted — retune the planted non-vacuity the way ta_bm25_bigram did)")
    rows.foreach { r =>
      val (n, sur, keep) = (r.getLong(1), r.getLong(5), r.getInt(7))
      assert(sur >= 0, s"negative surprisal: $r")
      assert(keep == (if (sur <= n * 344064L) 1 else 0), s"keep rule drifted: $r")
    }
    // the filter must actually split the corpus at the committed
    // threshold — an all-keep or all-drop outcome is a vacuous filter
    val kept = rows.count(_.getInt(7) == 1)
    assert(kept > 0 && kept < rows.length,
      s"threshold is vacuous on the gate corpus: kept $kept of ${rows.length}")
  }

  test("ivm_lm: maintained count views score exactly like one-shot training on the edited slice, and the edit is visible") {
    val dir = "/root/testdata/sf0.01"
    val plain = queries.Curate.lmPpl(spark, dir).collect().map(_.toString).toSeq
    val ivm = queries.Ivm.lmRetract.run(spark, dir).collect().map(_.toString).toSeq
    // in-engine one-shot equivalent: documents with the train half
    // edited the same way (odd/score docs untouched)
    Engine.table(spark, dir, "documents")
      .where("doc_id % 2 = 1 OR doc_id % 13 <> 0 OR doc_id % 4 = 0")
      .createOrReplaceTempView("documents")
    val oneShot = queries.Curate.lmPplOver(spark).collect().map(_.toString).toSeq
    assert(ivm.nonEmpty && ivm == oneShot,
      "maintained-view scoring diverged from one-shot training on the edited slice")
    // differential: un-training the %13 slice must move at least one
    // held-out doc's surprisal, or the retraction path is untested
    assert(ivm != plain,
      "the audit-withdrawal edit changed nothing — the scenario is vacuous")
    // stream ≡ batch: the maintainFrom loop must land the identical
    // maintained state (the fifth axis of the streamed retract loop)
    val streamed = queries.Ivm.lmStream.run(spark, dir).collect().map(_.toString).toSeq
    assert(streamed == ivm,
      "stream-maintained LM views diverged from batch applyDelta maintenance")
  }
}
