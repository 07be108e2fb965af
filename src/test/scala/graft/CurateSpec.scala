package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CurateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("curation pipeline filters, dedups, and keeps one member of every near-dup pair") {
    val total = Engine.table(spark, sf, "documents").count()
    val curated = queries.Curate.curatedCorpus(spark, sf)
    val rows = curated.collect()
    assert(rows.nonEmpty && rows.length <= total)

    // quality gates hold
    rows.foreach { r =>
      assert(r.getAs[Int]("n_tokens") >= 5)
      assert(r.getAs[Double]("distinct_ratio") >= 0.2)
    }

    // for every strong near-dup pair, the lower id survives, the higher
    // id is gone (unless itself filtered by quality gates)
    val pairs = queries.Dedup.minhashPairs(spark, sf, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val kept = rows.map(_.getLong(0)).toSet
    pairs.foreach { case (_, b) => assert(!kept.contains(b), s"dup loser $b survived") }
    assert(pairs.nonEmpty, "corpus should contain near-dups for this test to bite")
  }

  test("decontamination flags exactly the 5-gram-overlap docs, keeps clean docs") {
    val out = queries.Curate.decontaminate(spark, sf).collect()
    // eval slice excluded from the report
    assert(out.forall(_.getLong(0) % 23 != 0))
    val (dirty, clean) = out.partition(_.getAs[Boolean]("contaminated"))
    assert(clean.nonEmpty, "corpus should have uncontaminated docs")
    assert(clean.forall(_.getAs[Int]("n_overlap") == 0))
    assert(dirty.forall(_.getAs[Int]("n_overlap") >= 1))
    // the eval-side probe is a broadcast, not a corpus-wide shuffle join
    val plan = queries.Curate.decontaminate(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"eval n-gram set must broadcast-join the corpus grams:\n$plan")
  }

  test("source mixing up/downsamples deterministically by rate") {
    val out = queries.Curate.mixSources(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    val bySource = out.groupBy(_._2)
    val docs = Engine.table(spark, sf, "documents")
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val nBySource = docs.groupBy(_._2).view.mapValues(_.length).toMap
    // rate 2.5: every doc appears 2 or 3 times; mean multiplicity in (2,3)
    for (s <- Seq("src0", "src1", "src2") if nBySource.contains(s)) {
      val copies = bySource(s).groupBy(_._1).view.mapValues(_.length)
      assert(copies.values.forall(c => c == 2 || c == 3), s"$s multiplicity")
    }
    // rate 1.0: exactly once
    for (s <- Seq("src3", "src4", "src5") if nBySource.contains(s))
      assert(bySource(s).length == nBySource(s), s"$s must pass through 1:1")
    // rate 0.3: a strict subset, copy always 0
    for ((s, rows) <- bySource if !Set("src0","src1","src2","src3","src4","src5")(s)) {
      assert(rows.length < nBySource(s), s"$s must downsample")
      assert(rows.forall(_._3 == 0))
    }
    // deterministic: a second run is row-for-row identical
    val again = queries.Curate.mixSources(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(out.toSeq == again.toSeq)
  }

  test("pii redaction counts the injected spans and rewrites exactly them") {
    val out = queries.TextAnalysis.pii.run(spark, sf).collect()
    out.foreach { r =>
      val id = r.getLong(0)
      assert(r.getAs[Int]("n_emails") == (if (id % 5 == 0) 1 else 0), s"emails doc $id")
      assert(r.getAs[Int]("n_ips") == (if (id % 7 == 0) 1 else 0), s"ips doc $id")
      assert(r.getAs[Int]("n_phones") == (if (id % 11 == 0) 1 else 0), s"phones doc $id")
      assert(r.getAs[Boolean]("has_pii") == (id % 5 == 0 || id % 7 == 0 || id % 11 == 0))
    }
    assert(out.exists(_.getAs[Boolean]("has_pii")))
    assert(out.exists(!_.getAs[Boolean]("has_pii")))
  }

  test("sequence packing fills each bucket contiguously under the 512 budget") {
    val rows = queries.Curate.packSequences(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3), r.getInt(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, _, _, off) => assert(off >= 0 && off < 512) }
    // within a bucket, each doc starts exactly where the previous ended
    rows.groupBy(_._2).foreach { case (_, ds) =>
      var cum = 0L
      ds.sortBy(_._1).foreach { case (id, _, nt, seq, off) =>
        assert(seq.toLong * 512 + off == cum, s"doc $id start mismatch")
        cum += nt
      }
    }
    // parallelism unit: the only corpus shuffle keys on the bucket
    val p = queries.Curate.packSequences(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("hashpartitioning(bucket"),
      "packing window is not partitioned by the hash bucket")
  }

  test("exact-k sample: k rows per populated stratum through WindowGroupLimit") {
    val df = queries.Curate.sampleExactK(spark, "/root/testdata/sf0.001")
    assert(df.queryExecution.executedPlan.toString.contains("WindowGroupLimit"),
      "rn <= k lost its partial top-k")
    val rows = df.collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    val strata = Engine.table(spark, "/root/testdata/sf0.001", "documents")
      .selectExpr(
        """CASE WHEN length(text) < 200 THEN 'short'
          |     WHEN length(text) < 1000 THEN 'medium'
          |     ELSE 'long' END AS bucket""".stripMargin)
      .groupBy("bucket").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.groupBy(_._2).foreach { case (bucket, rs) =>
      assert(rs.length == math.min(25L, strata(bucket)),
        s"stratum $bucket sampled ${rs.length} of ${strata(bucket)}")
      assert(rs.map(_._3).sorted.toSeq == (1 to rs.length).toSeq)
    }
    // deterministic: a second run returns the identical sample
    val again = queries.Curate.sampleExactK(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(again.toSeq == rows.toSeq)
  }

  test("chunking covers every token exactly once outside the 16-token overlaps") {
    val chunks = queries.Curate.chunkDocuments(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))
    val docs = Engine.table(spark, "/root/testdata/sf0.001", "documents")
      .selectExpr("doc_id", "size(regexp_extract_all(text, '\\\\S+', 0)) AS n")
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    chunks.groupBy(_._1).foreach { case (doc, cs) =>
      val sorted = cs.sortBy(_._2)
      // chunk k starts at k*stride; sizes match the emitted text
      sorted.foreach { case (_, k, start, n, text) =>
        assert(start == k * 48)
        assert(text.split(" ").length == n)
        assert(n >= 1 && n <= 64)
      }
      // coverage: last chunk reaches the document's end, consecutive
      // chunks overlap by exactly size - stride (= 16) except a shorter
      // final chunk; every chunk past the first adds new tokens
      val total = docs(doc)
      val last = sorted.last
      assert(last._3 + last._4 == total, s"doc $doc not covered to its end")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._3 == a._3 + 48)
          assert(a._3 + a._4 > b._3, "consecutive chunks must overlap")
        case _ => ()
      }
    }
    assert(chunks.map(_._1).toSet == docs.keySet)
  }

  test("cross-database view inlining (tests/views/mod.rs:3-31)") {
    val gs = new graft.sql.GraftSession(spark)
    spark.sql("DROP DATABASE IF EXISTS graft_vdb CASCADE")
    gs.sql("create database graft_vdb")
    try {
      gs.sql("use graft_vdb")
      gs.sql("create table vt (c TEXT)")
      gs.sql("""insert into vt values ('tables')""")
      // bare CREATE VIEW owns the view to the current database
      // (graft_vdb); from default it resolves only via the qualifier
      gs.sql("create view graft_tv as select c as table_name from graft_vdb.vt")
      gs.sql("use default")
      val rows = gs.sql(
        """select t.table_name from graft_vdb.graft_tv t
          |join (select 'tables' as n) s on t.table_name = s.n""".stripMargin).collect()
      assert(rows.length == 1 && rows(0).getString(0) == "tables")
      // the bare name does NOT leak across databases (reference scoping)
      val err = intercept[Exception](
        gs.sql("select * from graft_tv").collect())
      assert(err.getMessage.contains("graft_tv"))
    } finally {
      gs.sql("use default")
      try gs.sql("drop view graft_vdb.graft_tv") catch { case _: Exception => () }
      spark.sql("DROP DATABASE IF EXISTS graft_vdb CASCADE")
    }
  }
}
