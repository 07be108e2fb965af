package graft.queries

import graft.{Engine, QueryDef}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Trained data-quality classification + importance resampling — the
  * curation loop a production training-data pipeline runs AFTER the
  * rule-based filters (`ta_quality`, `pipeline_lm_score`): train a
  * classifier on a labeled slice, score the corpus with it, and
  * importance-resample toward a target distribution. Public shapes:
  * the fastText-style quality classifier of CCNet/LLaMA data work
  * (Joulin et al. 2016; Wenzek et al. 2019) re-expressed as multinomial
  * Naive Bayes (pure counting — the trainable classifier a SQL engine
  * can make exact), and DSIR hashed-n-gram importance resampling
  * (Xie et al. 2023).
  *
  * Labels are WEAK SUPERVISION, the way the public pipelines do it
  * (fastText's "quality" label is really "was cited by Wikipedia"): a
  * cheap content rule labels the training slice — here
  * `tf('fast') > tf('slow')`, the only kind of label the driver's
  * topic-uniform synthetic corpus supports (its `lang`/`source` columns
  * are assigned independently of the text: measured, no token
  * distribution shift across either — a metadata label would make every
  * classifier key vacuously unlearnable, the exact 0-signal class
  * VERDICT r11/r12 flagged). The classifier never sees the rule, only
  * the labeled slice's token counts; held-out generalization is real
  * and pinned (ClassifySpec: ≥ 0.80 accuracy at the gate tier against a
  * 0.67 majority base rate).
  *
  * Exactness discipline (same as BM25/LM-surprisal): classic NB needs
  * ln() — not bit-portable — so every log here is [[flog2]], a 2^16
  * fixed-point log2 from bit-length plus a linear mantissa interpolation
  * (max error 0.086 bit, monotone). Scores are SUMS of BIGINTs —
  * order-independent, hence hash-identical on both engines. flog2 is
  * also the "finer replayable fixed-point idf" the bitlen-idf BM25
  * notes anticipate: it separates counts that land within one power of
  * two of each other (flog2(500) − flog2(402) = 25088 where
  * bitlen-idf = 0).
  *
  * 100 TB shape: training statistics are VOCABULARY-sized (one hash
  * aggregate over the labeled slice's postings), so the model broadcasts
  * into the scoring join — the corpus-scale cost is the posting scan it
  * shares with every other text operator via the swap-cached `tok_tf`,
  * plus one per-doc roll-up exchange. DSIR's feature space is a FIXED
  * 1024-bucket hash lattice, so both distribution sketches broadcast no
  * matter the corpus size, and selection is a budget-k
  * TakeOrderedAndProject (never a global sort).
  */
object Classify {

  // --- flog2: engine-portable fixed-point log2 -----------------------------
  // For integer x >= 1: with b = bitlen(x) and p = 2^(b-1),
  //   flog2(x) = (b-1)*2^16 + (x - p)*2^16 div p
  // i.e. floor(log2) in the high bits plus a linear interpolation of the
  // mantissa — monotone, exact integer arithmetic, and both engines render
  // it from bin()/shifts alone. All call sites keep x >= 1 (Laplace +1),
  // where the truncating (Spark `div`) and flooring (DuckDB `//`) integer
  // divisions agree because every operand is non-negative.
  private[graft] def flog2Spark(x: String): String =
    s"((length(bin($x)) - 1) * 65536 + (($x - shiftleft(CAST(1 AS BIGINT), length(bin($x)) - 1)) * 65536) div shiftleft(CAST(1 AS BIGINT), length(bin($x)) - 1))"
  private[graft] def flog2Duck(x: String): String =
    s"((length(bin($x)) - 1) * 65536 + (($x - (1::BIGINT << (length(bin($x)) - 1))) * 65536) // (1::BIGINT << (length(bin($x)) - 1)))"

  // --- labeled slice ---------------------------------------------------------
  // Train on the even half; the weak-supervision rule labels a doc positive
  // when 'fast' outnumbers 'slow' in it. Both classes are populated at every
  // gate tier (80/170 at sf0.01) and — because the rule is CONTENT — the
  // held-out docs carry the same signal the classifier must rediscover from
  // the full vocabulary's class counts.
  private val trainPred = "doc_id % 2 = 0"

  /** (doc_id, pos) under the weak-supervision rule, over any doc subset. */
  private def labelDocsOver(postRel: String, pred: String): String =
    s"""SELECT doc_id,
       |  CASE WHEN sum(CASE WHEN token = 'fast' THEN tf ELSE 0 END)
       |        > sum(CASE WHEN token = 'slow' THEN tf ELSE 0 END)
       |       THEN 1 ELSE 0 END AS pos
       |FROM ($postRel) lp WHERE $pred GROUP BY doc_id""".stripMargin

  /** (doc_id, pos) of the labeled slice, derived from a posting relation
    * (doc_id, token, tf). `edit` narrows the slice — `ivm_nb` uses it to
    * state the net effect of its retraction deltas for the oracle. */
  private[queries] def trainDocsOver(postRel: String, edit: String = ""): String =
    labelDocsOver(postRel, s"$trainPred$edit")

  /** The NB scoring body, one source of truth for the census key, the
    * serving path, and the IVM-refresh key (exactly the [[TextAnalysis.bm25Sql]]
    * pattern — the formula cannot drift between spellings).
    *
    * Contract of the injected relations:
    *   - `trBody`: (token, pos∈{0,1}, tf) — labeled training postings, raw
    *     or pre-aggregated (cls re-aggregates either way; this is what lets
    *     the maintained IVM state slot in verbatim);
    *   - `priBody`: one row (n1, n0) — labeled-document counts (the class
    *     prior); maintained incrementally by `ivm_nb`;
    *   - `scoreBody`: (doc_id, token, tf) — postings of the docs to score.
    *
    * Model: multinomial NB with Laplace smoothing. Per-token weight
    *   w = [flog2(c1+1) − flog2(t1+v)] − [flog2(c0+1) − flog2(t0+v)]
    * and an out-of-vocabulary token takes the same formula at c1=c0=0
    * (flog2(1) = 0 — the coalesce arm), so OOV mass is smoothed, not
    * dropped. llr adds the prior flog2(n1+1) − flog2(n0+1) once per doc;
    * keep = llr >= 0. Every sum is a BIGINT sum.
    *
    * Plan: cls/w are vocabulary-sized → the explicit BROADCAST hint puts
    * them on the build side of the left join over the scoring postings
    * at ANY tier (the aggregate's size is statistics-less, so at the
    * 1000× tier the estimator alone stops broadcasting and falls into a
    * corpus-side hashed relation — the hint is correctness-of-plan, and
    * DuckDB reads it as a plain comment, so the shared text stays one
    * source); tot/pri are scalar cross joins; the per-doc roll-up is the
    * one corpus-proportional exchange. */
  private[queries] def nbScoreSql(trBody: String, priBody: String,
      scoreBody: String, f: String => String): String =
    s"""WITH tr AS ($trBody),
       |cls AS (
       |  SELECT token,
       |    sum(CASE WHEN pos = 1 THEN tf ELSE 0 END) AS c1,
       |    sum(CASE WHEN pos = 0 THEN tf ELSE 0 END) AS c0
       |  FROM tr GROUP BY token),
       |tot AS (SELECT sum(c1) AS t1, sum(c0) AS t0, count(*) AS v FROM cls),
       |pri AS ($priBody),
       |w AS (
       |  SELECT c.token,
       |    (${f("c.c1 + 1")} - ${f("t.t1 + t.v")})
       |      - (${f("c.c0 + 1")} - ${f("t.t0 + t.v")}) AS w
       |  FROM cls c CROSS JOIN tot t),
       |sc AS (
       |  SELECT /*+ BROADCAST(w) */ s.doc_id,
       |    sum(s.tf * coalesce(w.w, ${f("t.t0 + t.v")} - ${f("t.t1 + t.v")})) AS lw
       |  FROM ($scoreBody) s
       |  LEFT JOIN w ON s.token = w.token
       |  CROSS JOIN tot t
       |  GROUP BY s.doc_id)
       |SELECT sc.doc_id,
       |  CAST(sc.lw + ${f("p.n1 + 1")} - ${f("p.n0 + 1")} AS BIGINT) AS llr,
       |  CAST(CASE WHEN sc.lw + ${f("p.n1 + 1")} - ${f("p.n0 + 1")} >= 0
       |       THEN 1 ELSE 0 END AS INT) AS keep
       |FROM sc CROSS JOIN pri p
       |ORDER BY doc_id""".stripMargin

  // Engine-specific posting bodies (unigram tokenization shared with
  // tok_tf / the BM25 family).
  private val duckPost =
    """SELECT doc_id, token, count(*) AS tf FROM (
      |  SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS token
      |  FROM documents) u
      |GROUP BY doc_id, token""".stripMargin
  private val sparkPost = "SELECT doc_id, token, tf FROM tok_tf"

  // MERGE hint: postings ⋈ labels is corpus×corpus on doc_id — sort-merge
  // at any tier (co-partitioned on a real cluster); a hash build of either
  // side rides corpus size (the measured sf100 OOM class). DuckDB reads
  // the hint as a comment.
  private def trOver(postRel: String, edit: String = ""): String =
    s"""SELECT /*+ MERGE(d) */ t.token, d.pos, t.tf
       |FROM ($postRel) t JOIN (${trainDocsOver(postRel, edit)}) d ON t.doc_id = d.doc_id""".stripMargin
  private def priOver(docsRel: String): String =
    s"""SELECT sum(CASE WHEN pos = 1 THEN 1 ELSE 0 END) AS n1,
       |       sum(CASE WHEN pos = 0 THEN 1 ELSE 0 END) AS n0
       |FROM ($docsRel) pd""".stripMargin
  private def scoreOver(postRel: String): String =
    s"SELECT doc_id, token, tf FROM ($postRel) sp WHERE NOT ($trainPred)"

  /** Swap-cached training statistics — OPTIMIZATION r14 (guide §2.4 /
    * §7.2 "duplicated subtrees"). `nbScoreSql` references its train
    * relation through cls (for w), through tot (the smoothing
    * denominators), and through tot again in the scoring roll-up's OOV
    * arm; with plain CTE inlining the labeled-postings SORT-MERGE JOIN
    * ran THREE times per invocation and the doc-label aggregate a fourth
    * time for pri (plans/r14/pipeline_classify_before.txt: SMJ at nodes
    * 22, 39, 65). The model is vocabulary-sized and the doc labels one
    * narrow row per training doc — both ride the session swap-cache
    * (the tok_tf pattern): the join and the label aggregate each run
    * once per corpus epoch, every reference reads the InMemoryRelation,
    * and the cached relations carry exact size statistics for the
    * broadcast decisions downstream. Returns (trBody, priBody) for
    * [[nbScoreSql]]; `edit` keeps the `ivm_nb` ground-truth path on its
    * own cache epoch (a different edit is a different plan, so
    * cacheSwap swaps rather than aliasing).
    */
  private def cachedModelBodies(spark: SparkSession, edit: String = ""): (String, String) = {
    // OPTIMIZATION r15 (guide §2.4 — the dsir is_tgt shape applied
    // here): the label is a PER-DOC predicate over the same posting rows
    // it then joins back to, so one window over the train slice replaces
    // the r14 shape's per-doc label aggregate + the full-corpus doc_id
    // SortMergeJoin (which sorted ALL of tok_tf just to attach pos).
    // Identical rows: the window's per-doc sums are the aggregate's, the
    // inner join contributed exactly the train docs' posting rows, and a
    // doc with no postings appeared in neither spelling. The windowed
    // slice is swap-cached (`nb_trw`); the vocabulary-sized model
    // aggregate (`nb_tragg`) caches on top of it as before, and the
    // class prior derives from nb_trw's per-doc roll-up (partitioning
    // preserved from the window — no extra exchange).
    val lw = Engine.cacheSwap("nb_trw", spark.sql(
      s"""SELECT doc_id, token, tf,
         |  CASE WHEN sum(CASE WHEN token = 'fast' THEN tf ELSE 0 END)
         |         OVER (PARTITION BY doc_id)
         |       > sum(CASE WHEN token = 'slow' THEN tf ELSE 0 END)
         |         OVER (PARTITION BY doc_id)
         |       THEN 1 ELSE 0 END AS pos
         |FROM tok_tf WHERE $trainPred$edit""".stripMargin))
    lw.createOrReplaceTempView("nb_trw")
    val tr = Engine.cacheSwap("nb_tragg", spark.sql(
      """SELECT token, pos, sum(tf) AS tf
        |FROM nb_trw GROUP BY token, pos""".stripMargin))
    tr.createOrReplaceTempView("nb_tragg")
    ("SELECT token, pos, tf FROM nb_tragg",
      priOver("SELECT doc_id, max(pos) AS pos FROM nb_trw GROUP BY doc_id"))
  }

  // --- ta_nb_train: the trained model is itself a relation ------------------
  /** Training IS one hash aggregate over the labeled slice — the model
    * (per-token class counts) is data, inspectable and joinable, which is
    * what makes it broadcastable at serve time and maintainable by IVM. */
  val nbTrain: QueryDef = QueryDef.sqlBacked(
    "ta_nb_train",
    s"""WITH tr AS (${trOver(duckPost)})
       |SELECT token,
       |  CAST(sum(CASE WHEN pos = 1 THEN tf ELSE 0 END) AS BIGINT) AS c1,
       |  CAST(sum(CASE WHEN pos = 0 THEN tf ELSE 0 END) AS BIGINT) AS c0
       |FROM tr GROUP BY token ORDER BY token""".stripMargin
  ) { (spark, dir) =>
    Engine.table(spark, dir, "documents").createOrReplaceTempView("documents")
    TextAnalysis.tokenPostings(spark, "documents")
    val (trBody, _) = cachedModelBodies(spark)
    spark.sql(
      s"""WITH tr AS ($trBody)
         |SELECT token,
         |  CAST(sum(CASE WHEN pos = 1 THEN tf ELSE 0 END) AS BIGINT) AS c1,
         |  CAST(sum(CASE WHEN pos = 0 THEN tf ELSE 0 END) AS BIGINT) AS c0
         |FROM tr GROUP BY token ORDER BY token""".stripMargin)
  }

  // --- pipeline_classify: score the held-out corpus with the trained model --
  def classify(spark: SparkSession, dir: String): DataFrame =
    classifyOneShot(spark, dir)

  /** One-shot train+score with an optionally EDITED train slice — the
    * from-scratch ground truth `ivm_nb`'s incremental refresh must equal
    * (ClassifySpec pins the equivalence Spark-side; the census oracle
    * re-proves it against DuckDB). */
  def classifyOneShot(spark: SparkSession, dir: String, edit: String = ""): DataFrame = {
    Engine.table(spark, dir, "documents").createOrReplaceTempView("documents")
    TextAnalysis.tokenPostings(spark, "documents")
    val (trBody, priBody) = cachedModelBodies(spark, edit)
    spark.sql(nbScoreSql(trBody, priBody, scoreOver(sparkPost), flog2Spark))
  }

  private val classifyOracle = nbScoreSql(trOver(duckPost),
    priOver(trainDocsOver(duckPost)), scoreOver(duckPost), flog2Duck)

  val classifyDef: QueryDef =
    QueryDef.sqlBacked("pipeline_classify", classifyOracle)(classify(_, _))

  // --- ta_nb_pr: the classifier's operating curve ---------------------------
  // Model selection needs the precision/recall sweep, and at corpus scale
  // the textbook spelling (rank every document, cumulative sums down the
  // global order) is a single-partition window over the corpus. This
  // spelling is the scale-safe one: scores are binned to WHOLE flog2 BITS
  // (bit_bin = floor(llr / 2^16) — a fixed, data-independent grid, so the
  // curve's state is bin-count-sized: tens of rows at any corpus size),
  // the per-bin (n, pos) aggregate rides the scoring roll-up, and the
  // cumulative window runs over the bins only. Thresholding "keep every
  // doc scoring above b bits" reads tp/fp/fn at that row; precision and
  // recall are each ONE IEEE division of exact integers (bit-identical
  // across engines). floor(x / 65536.0) rather than integer division
  // because llr is signed and Spark div truncates where DuckDB // floors
  // — the double division by 2^16 is exact for |llr| < 2^53, making
  // floor() the one portable spelling.
  private def nbPrSql(trBody: String, priBody: String, scoreBody: String,
      truthBody: String, f: String => String): String =
    s"""WITH sc AS (${nbScoreSql(trBody, priBody, scoreBody, f)}),
       |lab AS ($truthBody),
       |binned AS (
       |  SELECT /*+ MERGE(lab) */ CAST(floor(sc.llr / 65536.0) AS BIGINT) AS bit_bin,
       |    count(*) AS n, sum(lab.pos) AS pos
       |  FROM sc JOIN lab ON sc.doc_id = lab.doc_id
       |  GROUP BY CAST(floor(sc.llr / 65536.0) AS BIGINT))
       |SELECT bit_bin, CAST(n AS BIGINT) AS n, CAST(pos AS BIGINT) AS pos,
       |  CAST(tp AS BIGINT) AS tp,
       |  CAST(cum_n - tp AS BIGINT) AS fp,
       |  CAST(p_all - tp AS BIGINT) AS fn,
       |  CAST(tp AS DOUBLE) / cum_n AS prec,
       |  CAST(tp AS DOUBLE) / p_all AS rec
       |FROM (
       |  SELECT bit_bin, n, pos,
       |    sum(n) OVER (ORDER BY bit_bin DESC) AS cum_n,
       |    sum(pos) OVER (ORDER BY bit_bin DESC) AS tp,
       |    sum(pos) OVER () AS p_all
       |  FROM binned) c
       |ORDER BY bit_bin DESC""".stripMargin

  def nbPr(spark: SparkSession, dir: String): DataFrame = {
    Engine.table(spark, dir, "documents").createOrReplaceTempView("documents")
    TextAnalysis.tokenPostings(spark, "documents")
    val (trBody, priBody) = cachedModelBodies(spark)
    spark.sql(nbPrSql(trBody, priBody,
      scoreOver(sparkPost), labelDocsOver(sparkPost, s"NOT ($trainPred)"),
      flog2Spark))
  }

  private val nbPrOracle = nbPrSql(trOver(duckPost),
    priOver(trainDocsOver(duckPost)), scoreOver(duckPost),
    labelDocsOver(duckPost, s"NOT ($trainPred)"), flog2Duck)

  val nbPrDef: QueryDef = QueryDef.sqlBacked("ta_nb_pr", nbPrOracle)(nbPr(_, _))

  // --- pipeline_dsir: hashed-n-gram importance resampling (DSIR) -----------
  // Xie et al. 2023: estimate target and raw token distributions on a
  // FIXED hashed feature lattice (1024 buckets via the portable 60-bit
  // md5 hash), weight every document by its log importance ratio, and
  // resample the highest-weight docs into the mixture. Target: the
  // 'vector'-DENSE docs (tf('vector')·16 ≥ doc length — a density rule,
  // again the only kind of distribution shift this topic-uniform corpus
  // has; ~13% of docs). The per-doc weight is LENGTH-NORMALIZED (the
  // per-token average log importance ratio): the raw Σ-over-tokens form
  // degenerates on near-identical distributions into a document-length
  // ranking — measured: raw-sum selection ANTI-correlates with the
  // target trait here, while the normalized form enriches the selected
  // set to 2× the corpus's target density (pinned in ClassifySpec).
  //
  // Integer discipline: bucket log-ratios carry a +2^24 shift so the
  // per-doc sum is positive BEFORE the normalizing division — ranking is
  // EXACTLY shift-invariant (((Σtf·w) + S·n)·2^16 div n =
  // S·2^16 + (Σtf·w)·2^16 div n), and on non-negative operands Spark's
  // truncating `div` and DuckDB's flooring `//` agree. Bounds: |w| ≤
  // 2·63·2^16 < 2^23 even at BIGINT-count scale, so w+2^24 > 0 and the
  // scaled sum stays far inside BIGINT.
  // Plan discipline at the 1000× tier (measured, 5 M docs): every CTE
  // here is statistics-less, so the estimator alone neither broadcasts
  // the 1024-row bucket-weight relation nor avoids hashing a corpus-
  // sized side of the doc_id joins — the first sf100 run died building
  // a corpus-sized LongHashedRelation. The hints state what is true at
  // ANY scale: wb is lattice-sized (broadcast), bt⋈tgtd and dw⋈dlen are
  // corpus×corpus doc_id joins (sort-merge; co-partitioned on a real
  // cluster). DuckDB reads the hints as comments — one shared text.
  private val dsirBuckets = 1024
  private val dsirK = 128
  private val dsirShift = 1 << 24

  // OPTIMIZATION r14 (guide §2.4 "remove shuffles outright"): the
  // normalized weight used to be two per-doc aggregates joined back
  // together — dw (Σ tf·w) MERGE-joined to dlen (Σ tf), a corpus×corpus
  // sort-merge join whose two inputs were aggregates of the SAME rows.
  // Because wb carries one row for EVERY bucket in raw (raw ⊇ the
  // buckets of bt by construction, LEFT JOIN tgt keeps them all), the
  // bt⋈wb inner join preserves every bt row — so Σ tf over the joined
  // rows IS n_tok, and both sums fuse into ONE hash aggregate: the
  // dlen pass, its exchange, and the nwr sort-merge join all disappear.
  //
  // OPTIMIZATION r15 (guide §2.4 again — VERDICT r14 #5): what remained
  // was the bt⋈tgtd corpus×corpus MERGE join and the double per-bucket
  // pass (`tgt` and `raw` each aggregated bt). Both fold away:
  //   - the target-doc flag is a PER-DOC predicate over the same posting
  //     rows, so it comes from one window over doc_id (`is_tgt`) instead
  //     of a per-doc aggregate joined back on doc_id — the tgtd
  //     aggregate, both SMJ sorts and the join disappear;
  //   - `tgt` and `raw` fuse into ONE per-bucket aggregate (`btot`):
  //     cr = Σtf, ct = Σtf·is_tgt — identical values, since the old
  //     LEFT JOIN kept every bt row and coalesce(ct,0) ≡ the conditional
  //     sum over non-target buckets;
  //   - `tots` folds into wb as unbounded window sums over the
  //     1024-row btot relation (sum OVER () ≡ the scalar subqueries).
  // The flagged-bucket relation `bt` is referenced twice (btot, nwr), so
  // the Spark side swap-caches it (`dsir_bt`, the tok_tf pattern) — the
  // window runs once, riding the parallelCorpus doc_id exchange (the
  // after-plan shows Window directly over Sort over that one Exchange —
  // no second shuffle to establish the window's distribution). The nwr
  // per-doc roll-up keeps its own exchange (a cached adaptive plan
  // reports unknown partitioning), but it moves partially-aggregated
  // (doc_id, sums) rows. Corpus-scale plan: tgtd aggregate + both SMJ
  // sort-exchanges + raw's second bt pass all GONE
  // (plans/r15/pipeline_dsir_{before,after}.txt: 90 → 31 plan nodes,
  // 12 → 4 Exchange nodes, 2 SortMergeJoins → 0). The oracle inlines the
  // same bt text (DuckDB materializes multi-referenced CTEs); provably
  // row-identical, and the shared template keeps both engines on one
  // spelling.
  private[queries] def dsirBtSql(hash: String => String, postBody: String): String =
    s"""SELECT doc_id, ${hash("token")} % $dsirBuckets AS b, tf,
       |  CASE WHEN sum(CASE WHEN token = 'vector' THEN tf ELSE 0 END)
       |         OVER (PARTITION BY doc_id) * 16
       |       >= sum(tf) OVER (PARTITION BY doc_id) THEN 1 ELSE 0 END AS is_tgt
       |FROM ($postBody) post""".stripMargin

  private def dsirSql(f: String => String, btBody: String, idiv: String): String =
    s"""WITH bt AS ($btBody),
       |btot AS (
       |  SELECT b, sum(tf) AS cr, sum(tf * is_tgt) AS ct
       |  FROM bt GROUP BY b),
       |wb AS (
       |  SELECT b,
       |    (${f("ct + 1")} - ${f(s"sum(ct) OVER () + $dsirBuckets")})
       |      - (${f("cr + 1")} - ${f(s"sum(cr) OVER () + $dsirBuckets")}) + $dsirShift AS w
       |  FROM btot),
       |nwr AS (
       |  SELECT /*+ BROADCAST(wb) */ bt.doc_id,
       |    CAST((sum(bt.tf * wb.w) * 65536) $idiv sum(bt.tf) AS BIGINT) AS nw
       |  FROM bt JOIN wb ON bt.b = wb.b
       |  GROUP BY bt.doc_id)
       |SELECT doc_id, nw,
       |  CAST(row_number() OVER (ORDER BY nw DESC, doc_id) AS INT) AS rnk
       |FROM (SELECT doc_id, nw FROM nwr ORDER BY nw DESC, doc_id LIMIT $dsirK) s
       |ORDER BY rnk""".stripMargin

  def dsir(spark: SparkSession, dir: String): DataFrame = {
    Engine.table(spark, dir, "documents").createOrReplaceTempView("documents")
    // r15: dsir reads the posting relation exactly once (the bt window
    // consumes it), so the kernel stream feeds the window directly — no
    // tok_tf InMemoryRelation materialization in this cell's one-shot
    // cost; the cached relation here is the flagged bucket relation
    // itself, which IS read twice (btot + nwr).
    TextAnalysis.ngramPostingsDf(spark, "documents", 1)
      .createOrReplaceTempView("dsir_post")
    val bt = Engine.cacheSwap("dsir_bt",
      spark.sql(dsirBtSql(Dedup.portableHash60Spark,
        "SELECT doc_id, token, tf FROM dsir_post")))
    bt.createOrReplaceTempView("dsir_bt")
    spark.sql(dsirSql(flog2Spark,
      "SELECT doc_id, b, tf, is_tgt FROM dsir_bt", "div"))
  }

  private val dsirOracle =
    dsirSql(flog2Duck, dsirBtSql(Dedup.portableHash60Duck, duckPost), "//")

  val dsirDef: QueryDef = QueryDef.sqlBacked("pipeline_dsir", dsirOracle)(dsir(_, _))

  // --- serving + IVM hooks ---------------------------------------------------
  /** Register the trained statistics of `dir`'s corpus as the serving
    * views `nb_model` (token, pos, tf) and `nb_prior` (n1, n0) — train
    * once per session (the model relations ride the swap-cached posting
    * aggregate), then [[scoreBatch]] any number of incoming batches. */
  def registerModel(spark: SparkSession, dir: String): Unit = {
    Engine.table(spark, dir, "documents").createOrReplaceTempView("documents")
    TextAnalysis.tokenPostings(spark, "documents")
    spark.sql(trOver(sparkPost)).createOrReplaceTempView("nb_model")
    spark.sql(priOver(trainDocsOver(sparkPost))).createOrReplaceTempView("nb_prior")
  }

  /** Score an ARBITRARY batch of (doc_id, text) rows against trained
    * statistics already registered as views `nb_model` (token, pos, tf)
    * and `nb_prior` (n1, n0) — the serving shape: the model relation is
    * vocabulary-sized and broadcasts; only the batch is tokenized. */
  def scoreBatch(batch: DataFrame): DataFrame = {
    val s = batch.sparkSession
    batch.createOrReplaceTempView("nb_batch")
    s.sql(nbScoreSql(
      "SELECT token, pos, tf FROM nb_model",
      "SELECT n1, n0 FROM nb_prior",
      // per-row kernel aggregate (r15): doc_id unique per batch row, so
      // the GROUP BY exchange was pure recombination — see
      // TextAnalysis.tokenPostings
      """SELECT doc_id, inline(word_ngram_tfs(lower(text), 1))
        |FROM nb_batch""".stripMargin,
      flog2Spark))
  }

  /** Oracle twin used by `ivm_nb`: one-shot NB recomputed from scratch
    * over an EDITED train slice (`edit` appended to the slice predicate). */
  private[queries] def classifyOracleEdited(edit: String): String =
    nbScoreSql(trOver(duckPost, edit),
      priOver(trainDocsOver(duckPost, edit)), scoreOver(duckPost), flog2Duck)

  /** Spark-side pieces `ivm_nb` composes: filter spellings + the score body. */
  private[queries] def sparkScoreBody: String = scoreOver(sparkPost)
  private[queries] def sparkTrainDocs(edit: String = ""): String =
    trainDocsOver(sparkPost, edit)

  /** Labeled training postings WITH doc_id — what `ivm_nb` keys its
    * retractable state's deltas on (a document's withdrawal is one freq
    * −1 over exactly these rows). */
  private[queries] def sparkTrainPostingsWithDoc(edit: String = ""): String =
    s"""SELECT /*+ MERGE(d) */ t.doc_id, t.token, d.pos, t.tf
       |FROM tok_tf t JOIN (${trainDocsOver(sparkPost, edit)}) d ON t.doc_id = d.doc_id""".stripMargin

  val all: Seq[QueryDef] = Seq(nbTrain, classifyDef, nbPrDef, dsirDef)
}
