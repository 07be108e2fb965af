package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan contracts: the properties that make these queries scale are plan
  * shapes, not results — pushed filters, pruned scans, broadcast
  * dimensions, partial aggregation. These specs pin them so a refactor
  * that silently trades one away (e.g. an expression change that blocks
  * parquet pushdown) fails fast. Assertions are substring checks on the
  * formatted plan, kept loose enough to survive AQE formatting drift.
  */
class PlanContractSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
  }

  test("q1: shipdate filter reaches the parquet scan; aggregation is partial+final") {
    val p = plan("q1_agg")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      "filter not pushed to scan")
    assert(p.contains("partial_sum"), "no map-side partial aggregation")
  }

  test("q5: every dimension joins as broadcast; the fact table is never shuffled for a join") {
    val p = plan("q5_join")
    // formatted mode prints each operator once as "(n) BroadcastHashJoin"
    val broadcasts = """\(\d+\) BroadcastHashJoin""".r.findAllIn(p).size
    assert(broadcasts == 5, s"expected 5 broadcast joins, plan had $broadcasts")
    assert(!p.contains("SortMergeJoin"), "fact-side join fell back to sort-merge at test SF")
  }

  test("broadcast policy: threshold is Spark's default; minhash plan stays off the broadcast cliff") {
    // Round 7 set autoBroadcastJoinThreshold=64m session-wide and the
    // minhash plan compiled to 12 BroadcastHashJoins over derived
    // intermediates (shingle sets, band groups) whose size estimates are
    // guesses — two broadcast-build OOMs on an 8 GiB driver (VERDICT r7).
    // The 64m intent is now scoped to base tables via
    // Engine.broadcastIfSmall (real on-disk size); every other broadcast
    // must clear the conservative default estimate gate.
    assert(spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == "10485760b"
      || spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == "10485760",
      "engine sessions must keep Spark's default broadcast threshold")
    val p = plan("dedup_minhash_lsh")
    val broadcasts = """\(\d+\) BroadcastHashJoin""".r.findAllIn(p).size
    // Exact pin, not a bound (ADVICE r8): the plan at sf0.001 compiles to
    // exactly 6 broadcast joins today; any drift — up OR down — means the
    // broadcast policy or the pipeline shape changed and must be re-audited.
    // Caveat this test can't cover: sf0.001 estimates sit below even the
    // 10m default threshold, so what it really pins is the session
    // threshold + plan shape at test SF; a partial regression that only
    // manifests on larger derived intermediates (7-11 estimate-gated
    // broadcasts at real SFs) needs the sf1/sf10 bench artifacts, where a
    // broadcast-build OOM or timing cliff would surface.
    assert(broadcasts == 6,
      s"minhash plan has $broadcasts broadcast joins (pinned 6) — re-audit the broadcast policy")
  }

  test("q6: all predicates pushed; scan reads only the needed columns") {
    val p = plan("q6_filter")
    assert(p.contains("PushedFilters") && p.contains("GreaterThanOrEqual(l_shipdate"))
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!read.contains("l_orderkey") && !read.contains("l_comment"),
      s"scan reads unneeded columns: $read")
  }

  test("op_limit: projection prunes the scan to the single selected column") {
    val p = plan("op_limit")
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("o_orderkey"))
    assert(!read.contains("o_totalprice") && !read.contains("o_orderstatus"),
      s"scan reads unneeded columns: $read")
  }

  test("ta_repetition: scoring is shuffle-free — no hash exchange, only the output sort") {
    val p = plan("ta_repetition")
    // the per-row fold must never regress to an explode+groupBy shuffle
    assert(!p.contains("hashpartitioning"),
      "repetition scoring shuffles the corpus — fold regressed to groupBy")
    assert(!p.contains("Generate"), "explode appeared in the scoring path")
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!read.contains("lang") && !read.contains("url"),
      s"scan reads unneeded columns: $read")
  }

  test("ta_tfidf: df is a count window over tf — no equi-join; top-k prunes map-side") {
    val p = plan("ta_tfidf")
    // df = count(*) OVER (PARTITION BY token) rides the token exchange;
    // a separate df aggregate + join back re-shuffles all of tf
    // (measured at sf10: 7.9 s → 5.2 s warm when the join was removed)
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin") &&
      !p.contains("BroadcastHashJoin"),
      "df regressed to an aggregate + equi-join back on token")
    assert(p.contains("WindowGroupLimit"),
      "rnk<=3 no longer prunes as a partial top-k before the doc_id exchange")
    assert(p.contains("partial_count"), "no map-side partial aggregation for tf")
  }

  test("evt_range_join: the band join stays an equi-join, never a cross/nested-loop product") {
    val p = plan("evt_range_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "range join degenerated to a product join")
  }

  test("ann_ivf_topk: centroid assignment is a shuffle-free projection; probes broadcast") {
    val p = plan("ann_ivf_topk")
    // The cell comes from the codegen argmax_dot kernel against the
    // plan-time-constant centroid matrix...
    assert(p.contains("argmax_dot"), "assignment no longer uses the argmax kernel")
    // ...so NO exchange is keyed on the corpus row id: the window-argmax
    // spelling this replaced shuffled the entire corpus on vec_id.
    assert(!p.contains("hashpartitioning(vec_id"),
      "corpus-wide exchange on vec_id — assignment regressed to a shuffle")
    // The probe set joins the corpus as a broadcast: the corpus is never
    // shuffled for the join, only (query, candidate, score) triples move.
    assert(p.contains("BroadcastHashJoin"), "probe join not broadcast")
    assert(!p.contains("SortMergeJoin"), "probe join shuffled the corpus")
  }

  test("dedup_containment: verification is the merge-walk kernel, computed once per site") {
    val p = plan("dedup_containment")
    // The interpreted per-direction array_intersect (which built a hash
    // set per candidate pair, twice) must never come back...
    assert(!p.contains("array_intersect"),
      "containment verification regressed to interpreted array_intersect")
    // ...and each phase's kernel appears at most twice: once in its
    // pushed-down join condition (the [2] max element keeps it to ONE
    // call there — join conditions get no subexpression elimination) and
    // once in its projection. More occurrences = an optimizer rewrite
    // started duplicating the O(|a|+|b|) walk per direction again.
    val hashedCalls = "containment_stats64\\(".r.findAllIn(p).size
    val exactCalls = "containment_stats\\(".r.findAllIn(p).size
    assert(hashedCalls >= 1 && hashedCalls <= 2,
      s"hashed prefilter kernel: $hashedCalls occurrences")
    assert(exactCalls >= 1 && exactCalls <= 2,
      s"exact verification kernel: $exactCalls occurrences")
  }

  test("pipeline_sample: hash-Bernoulli sampling is a shuffle-free scan+filter") {
    val p = plan("pipeline_sample")
    // the only exchange permitted is the final presentation sort's range
    // partitioning — sampling itself must never hash-shuffle the corpus
    assert(!p.contains("hashpartitioning"),
      "sampling introduced a hash shuffle — no longer a scan-speed filter")
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("doc_id") && read.contains("text") && !read.contains("lang"),
      s"scan reads more than the sampled columns: $read")
  }

  test("dedup_exact_hash: the shuffle key is the fingerprint, group-by is partial+final") {
    val p = plan("dedup_exact_hash")
    assert(p.contains("partial_min") && p.contains("partial_count"),
      "no map-side combine before the fingerprint shuffle")
    // md5(text) is projected map-side into _groupingexpression; the
    // exchange then partitions on that 32-char fingerprint, so the
    // shuffle never carries document bodies.
    assert(p.contains("md5(cast(text") && p.contains("hashpartitioning(_groupingexpression"),
      "shuffle is not keyed on the pre-computed md5 fingerprint")
  }

  test("ta_pii: scrub is a shuffle-free projection — only the output sort exchanges") {
    val p = plan("ta_pii")
    assert(!p.contains("hashpartitioning"),
      "pii scrub introduced a hash shuffle — no longer scan-speed")
    assert(!p.contains("Generate"), "explode appeared in the scrub path")
  }

  test("pipeline_mix: bounded explode+filter, no hash shuffle of the corpus") {
    val p = plan("pipeline_mix")
    assert(!p.contains("hashpartitioning"),
      "mixing introduced a hash shuffle — no longer scan-speed")
    assert(p.contains("Generate"), "the copy explode disappeared from the plan")
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!read.contains("text"), s"mixing reads document bodies: $read")
  }

  test("ta_boilerplate: df head broadcasts back — doc grams never hash-join-shuffle") {
    val p = plan("ta_boilerplate")
    assert(p.contains("BroadcastHashJoin"),
      "boilerplate-gram set no longer broadcasts against the doc grams")
  }

  test("pipeline_chunk: chunking is generate-only — no hash shuffle of the corpus") {
    val p = plan("pipeline_chunk")
    assert(p.contains("Generate"), "the chunk-index explode disappeared")
    assert(!p.contains("hashpartitioning"),
      "chunking introduced a hash shuffle — no longer scan-speed")
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!read.contains("lang") && !read.contains("source"),
      s"chunking reads unneeded columns: $read")
  }

  test("evt_gapfill: every exchange is keyed on user_id — the dense grid never shuffles") {
    val p = plan("evt_gapfill")
    // sparse-series shape: the hourly aggregate and the lead() window
    // exchange on user-keyed partitions; the explode of gap runs comes
    // AFTER the window, so no exchange is keyed on the dense hour grid
    assert(p.contains("Generate"), "gap runs are no longer exploded from the sparse series")
    assert(p.contains("hashpartitioning(user_id#"),
      "the sparse aggregate/window lost its user-keyed exchange")
    assert(!p.contains("hashpartitioning(hour_start"),
      "an exchange is keyed on the dense grid")
    // no join anywhere: the grid-join spelling costs an extra corpus shuffle
    assert(!p.contains("Join"), "gapfill regressed to the grid-join plan")
  }

  test("gapfillSeries library surface has no global sort") {
    // The library plan must stop at sortWithinPartitions (partition-
    // local, no exchange). A global Sort plans as a rangepartitioning
    // exchange over the DENSIFIED grid — the single most expensive
    // operator in the old sf10 cell (VERDICT r9 #3).
    val p = queries.Events.gapfillSeries(spark, sf).queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(!p.contains("rangepartitioning"),
      "library gapfill regressed to a global ORDER BY (rangepartitioning exchange)")
    assert(p.contains("Sort"), "per-user local clustering disappeared entirely")
    assert(!p.contains("Join"), "gapfill regressed to the grid-join plan")
  }

  test("evt_gapfill_series: the digest's only global sort is above the per-user aggregate") {
    // The census key (r12) hash-gates the sort-free library plan through
    // a per-user digest. Its ORDER BY user_id may only sort the
    // AGGREGATED relation (|users| rows): in the formatted plan the
    // rangepartitioning exchange must sit above the final HashAggregate,
    // never under it where it would total-sort the dense grid.
    val p = plan("evt_gapfill_series")
    assert(!p.contains("Join"), "gapfill regressed to the grid-join plan")
    assert("rangepartitioning".r.findAllIn(p).size == 1,
      "more than one global sort appeared — something below the digest is total-sorting")
    // the formatted tree prints output-side operators first: the global
    // Sort must sit ABOVE (= earlier line than) the digest HashAggregates
    val lines = p.linesIterator.toSeq
    val sortAt = lines.indexWhere(_.matches(""".*\bSort \(\d+\).*"""))
    val aggAt = lines.indexWhere(_.contains("HashAggregate ("))
    assert(sortAt >= 0 && aggAt >= 0 && sortAt < aggAt,
      "the global sort must consume the per-user digest aggregate, not the grid " +
        s"(sort line $sortAt, first HashAggregate line $aggAt)")
    // partial+final per-user aggregation: the digest exchange carries
    // one partial row per (user, input partition), never grid rows
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      "digest aggregation lost its map-side partial")
  }

  test("pipeline_rag: one fingerprint exchange, then projections to the index row") {
    val p = plan("pipeline_rag")
    assert(p.contains("argmax_dot") && p.contains("quant_stats"),
      "embed/assign/quantize stages lost their codegen kernels")
    // the only hashpartitioning exchanges are the md5-fingerprint dedup
    // window; nothing re-shuffles the corpus on doc or chunk ids afterward
    assert(!p.contains("hashpartitioning(doc_id"),
      "a corpus-wide exchange on doc_id appeared in the index build")
  }

  test("pipeline_sample_k: per-stratum top-k runs as WindowGroupLimit partial top-k") {
    val p = plan("pipeline_sample_k")
    assert(p.contains("WindowGroupLimit"), "rn <= k lost its partial top-k")
  }

  test("ivm_bm25_lsm probe: query tokens push into BOTH segment scans; edits compose as broadcast anti-joins") {
    // The r14 scale lesson pinned: the first-cut probe composed the full
    // corpus-sized posting union and died of executor memory at 5 M docs.
    // The fix — prune both segments to the query batch's vocabulary
    // BEFORE composing — only holds while the In-filter actually reaches
    // the parquet scans, and while the tombstone/delta-id edits stay
    // broadcast anti-joins (never a corpus-side shuffle).
    val st = queries.Ivm.bm25LsmBuild(spark, sf)
    val df = queries.Ivm.bm25LsmProbe(spark, sf, st)
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    val pushedIn = "PushedFilters: \\[In\\(token".r.findAllIn(p).size
    assert(pushedIn >= 2,
      s"query-token In-filter must push into base AND delta posting scans, saw $pushedIn:\n")
    val anti = "BroadcastHashJoin .*LeftAnti".r.findAllIn(p).size
    assert(anti >= 4, // tombstones + delta-ids on postings (×2 via qt) at least
      s"edit composition must be broadcast anti-joins, saw $anti LeftAnti broadcasts")
    assert(!p.contains("SortMergeJoin [token"),
      "posting-side token join fell back to a corpus shuffle")
  }

  test("ta_winnow: gram hashes compute map-side — no exchange ever carries document text") {
    val p = plan("ta_winnow")
    assert(p.contains("Generate"), "the gram-position explode disappeared")
    // every Exchange's Input list must be hash/position columns only: the
    // n-rows-per-doc blowup must never ride a shuffle with the text column
    val exchangeInputs = """\(\d+\) Exchange\n(Input[^\n]*)""".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(exchangeInputs.nonEmpty, "no Exchange details found in formatted plan")
    // exact attribute-name match (ADVICE r9): a bare contains("t#") also
    // fires on any attribute merely ENDING in t (count#, cnt#), turning an
    // unrelated partial-agg column into a spurious text-leak failure
    val textAttr = """\b(t|text)#\d+""".r
    exchangeInputs.foreach { in =>
      assert(textAttr.findFirstIn(in).isEmpty,
        s"an exchange carries document text: $in")
    }
  }

  test("dedup_containment: candidate exchanges never carry text or string-shingle arrays") {
    // The two-phase design's payoff is payload shape: everything from the
    // posting-list explode through the hashed prefilter shuffles 8-byte
    // hashes and ids only. Heavy payloads may ride an exchange ONLY on
    // the doc-keyed verify/cache-build paths (fp or doc_id partitioning,
    // cardinality = corpus, crossed once per epoch), never the sid-keyed
    // posting or pair-keyed candidate exchanges whose cardinality is the
    // exploded index — a regression re-inflates the biggest shuffles in
    // the op by ~400× and it shows nowhere else (results stay identical).
    // OPTIMIZATION r15 amended WHICH payload the one cache-build
    // exchange carries: the is_rep window now runs over (doc_id, fp,
    // text) and the shingle arrays are computed above it, so the fp
    // exchange moves the raw text (~1/3 the bytes of the
    // distinct-shingle arrays it used to move — every word rides three
    // shingles). The pin therefore allows text exactly where it allows
    // arrays: fp/doc-keyed exchanges only.
    val p = plan("dedup_containment")
    val exchanges = """\(\d+\) Exchange\n(Input[^\n]*)\n(Arguments:[^\n]*)""".r
      .findAllMatchIn(p).map(m => (m.group(1), m.group(2))).toSeq
    assert(exchanges.nonEmpty, "no Exchange details found in formatted plan")
    val textAttr = """\b(t|text)#\d+""".r
    val stringShingles = """\bshingles#\d+""".r // \b rejects hshingles# (long hashes — allowed)
    val candidateKeyed = (args: String) =>
      args.contains("hashpartitioning(sid#") ||
        args.contains("hashpartitioning(id_a") ||
        args.contains("hashpartitioning(id_b")
    exchanges.foreach { case (in, args) =>
      if (textAttr.findFirstIn(in).isDefined)
        assert(!candidateKeyed(args) && args.contains("hashpartitioning(fp#"),
          s"document text rides a non-cache-build containment exchange: $in / $args")
      if (stringShingles.findFirstIn(in).isDefined)
        assert(!candidateKeyed(args),
          s"string shingle arrays entered a candidate-side exchange: $in / $args")
    }
  }

  test("pipeline_shuffle: shard-parallel window — never a single-partition global rank") {
    val p = plan("pipeline_shuffle")
    // the whole point of the shard design: a global row_number would plan
    // as one SinglePartition window holding the entire corpus
    assert(!p.contains("SinglePartition"),
      "training shuffle collapsed to a global single-partition window")
    assert(p.contains("hashpartitioning"), "shard window lost its parallel exchange")
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!read.contains("text"), s"shuffle reads document bodies: $read")
  }

  test("dedup_keep_best: selection exchanges carry fixed-width ids, never text") {
    // The canonical-selection contract: length(text) is computed AT the
    // scan, so the post-clustering window exchange moves (doc_id,
    // cluster_id, keep_chars) — three 8-byte columns per doc — and the
    // top-1-per-cluster prunes map-side via WindowGroupLimit before the
    // full rank ever materializes. A regression that shuffles document
    // bodies for the selection would show nowhere in results.
    val p = plan("dedup_keep_best")
    val exchangeInputs = """\(\d+\) Exchange\n(Input[^\n]*)""".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(exchangeInputs.nonEmpty, "no Exchange details found in formatted plan")
    val textAttr = """\btext#\d+""".r
    exchangeInputs.foreach { in =>
      assert(textAttr.findFirstIn(in).isEmpty,
        s"a selection exchange carries document text: $in")
    }
    assert(p.contains("WindowGroupLimit"),
      "top-1-per-cluster lost its map-side group-limit pruning")
  }

  private def exchangeInputs(p: String): Seq[String] =
    """\(\d+\) Exchange\n(Input[^\n]*)""".r
      .findAllMatchIn(p).map(_.group(1)).toSeq

  private val textAttrRe = """\btext#\d+""".r

  test("ann_hybrid_rrf: fusion exchanges carry tokens and ranks, never document text") {
    // The lexical arm tokenizes AT the scan; everything that crosses an
    // exchange afterwards is (token) or (query_id, cand_id, count/rank)
    // triples. A regression that shuffles bodies would be invisible in
    // results and ruinous at corpus scale.
    val p = plan("ann_hybrid_rrf")
    val ins = exchangeInputs(p)
    assert(ins.nonEmpty, "no Exchange details found in formatted plan")
    ins.foreach { in =>
      assert(textAttrRe.findFirstIn(in).isEmpty,
        s"a fusion exchange carries document text: $in")
    }
  }

  test("ta_bpe_pairs: the only corpus-scale exchange is the word table; text never shuffles") {
    val p = plan("ta_bpe_pairs")
    val ins = exchangeInputs(p)
    assert(ins.nonEmpty, "no Exchange details found in formatted plan")
    ins.foreach { in =>
      assert(textAttrRe.findFirstIn(in).isEmpty,
        s"a BPE exchange carries document text: $in")
    }
    // word counting must combine map-side — the corpus-scale explode
    // exchanges one row per DISTINCT word per partition, not per token
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      "word-frequency aggregation lost its map-side combine")
  }

  test("ann_kmeans_train: assignment is the broadcast kernel; vectors never cross an exchange") {
    val p = plan("ann_kmeans_train")
    assert(p.contains("argmax_dot_bc"),
      "cell assignment no longer runs through the broadcast argmax kernel")
    val vecAttr = """\b(v|embedding)#\d+""".r
    exchangeInputs(p).foreach { in =>
      assert(vecAttr.findFirstIn(in).isEmpty,
        s"a training exchange carries embedding vectors: $in")
    }
  }

  test("ngram rare-index build: the df head is the ONE posting exchange; the index itself is exchange-free") {
    // The exact-df structural toll, pinned as a plan (VERDICT r12 #5):
    // dedup_ngram_jaccard's contract is per-copy doc frequency, so ONE
    // posting-level exchange — the df aggregate on the 8-byte shingle
    // key, map-side partial-agg'd — is irreducible. Everything AROUND it
    // must stay gone: the rare index builds as pure scan projections
    // (the not_in_sorted64 broadcast-head kernel), no window sort, no
    // posting re-shuffle. Cached-plan strings embed the build plans.
    queries.Dedup.ngramJaccardPairs(spark, sf).collect()
    // cached-plan strings embed the NESTED dedup_sh cache build (whose
    // document-level fingerprint exchange is a different relation's
    // cost) — assert on the build slice between the view and the FIRST
    // cache boundary below it. Two forms exist depending on what ran
    // before in the session (the pin must hold in both — this test used
    // to fail when run standalone because it assumed one of them):
    //   - un-substituted: the view's plan IS the build, truncate at the
    //     dedup_sh cache boundary → segment 0;
    //   - cache-substituted: the view's plan is an InMemoryTableScan of
    //     the relation's own cache, whose printed InMemoryRelation node
    //     embeds the build → the build is segment 1, ending at the
    //     nested dedup_sh boundary.
    def buildSlice(p: String, marker: String): String = {
      val segs = p.split("TableCacheQueryStage|InMemoryRelation")
      if (segs(0).contains(marker)) segs(0) else segs.lift(1).getOrElse("")
    }
    val rinv = buildSlice(
      spark.table("ngram_rinv").queryExecution.executedPlan.toString,
      "not_in_sorted64")
    assert(rinv.contains("not_in_sorted64"),
      "rare subset no longer computed by the scan kernel:\n" + rinv)
    assert(!rinv.contains("Exchange") && !rinv.contains("Sort ["),
      "the rare-index build regained a posting-level exchange/sort:\n" + rinv)
    val head = buildSlice(
      spark.table("ngram_rinv_common").queryExecution.executedPlan.toString,
      "partial_count")
    assert(head.contains("partial_count"),
      "df head lost its map-side partial aggregation:\n" + head)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(head).size
    assert(exchanges == 1,
      s"df head build must shuffle exactly once (keyed on sid), saw $exchanges:\n" + head)
  }
}
