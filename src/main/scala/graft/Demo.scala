package graft

import graft.sql.GraftSession

/** Runnable tour of the reference-dialect surface — what a user of the
  * reference would type, executed by this library over the parquet tables:
  *
  *   sbt "runMain graft.Demo [sfDir]"
  *
  * Covers the MySQL-ish statements the reference serves (SHOW / DDL /
  * `DIRECTORY` scans / `->>` JSON ops / `LIMIT off,n` / magic vars) plus
  * a TPC-H query through plain SQL. Results print in the reference's
  * pipe format (one `|v1|v2|…|` line per row, NULL spelled out).
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = Engine.build()
    Engine.registerAll(spark, sfDir)
    val gs = new GraftSession(spark)

    def show(sql: String, limit: Int = 6): Unit = {
      println(s"\ngraft> $sql")
      val df = gs.sql(sql)
      df.take(limit).foreach { row =>
        println(row.toSeq.map(v => if (v == null) "NULL" else v.toString)
          .mkString("|", "|", "|"))
      }
    }

    show("SELECT database(), @@max_allowed_packet")
    show("SHOW TABLES", limit = 10)
    show("SELECT name FROM incresql.databases")
    show("SELECT r_name FROM region ORDER BY r_regionkey")
    show("SELECT o_orderkey, o_orderstatus FROM orders ORDER BY o_orderkey LIMIT 2, 3")
    show("""SELECT props ->> "$.k" FROM events ORDER BY event_id LIMIT 3""")
    show(
      """SELECT l_returnflag, count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    show("CREATE VIEW demo_asia AS SELECT * FROM region WHERE r_name = 'ASIA'")
    show("SELECT r_regionkey, r_name FROM demo_asia")
    show("DROP VIEW demo_asia")
    // views are database-scoped, like the reference catalog: bare names
    // resolve only in the owning database, qualified names from anywhere
    spark.sql("DROP DATABASE IF EXISTS demo_db CASCADE")
    show("CREATE DATABASE demo_db")
    show("USE demo_db")
    show("CREATE VIEW demo_v AS SELECT r_name FROM region WHERE r_regionkey = 0")
    show("SELECT * FROM demo_v")
    show("USE default")
    show("SELECT * FROM demo_db.demo_v")
    show("DROP VIEW demo_db.demo_v")
    show("DROP DATABASE demo_db")
    // training-pipeline extensions: repetition quality filter and int8
    // embedding quantization (both pure per-row projections)
    def showDf(label: String, df: org.apache.spark.sql.DataFrame, limit: Int = 3): Unit = {
      println(s"\ngraft> [pipeline] $label")
      df.take(limit).foreach { row =>
        println(row.toSeq.map(v => if (v == null) "NULL" else v.toString)
          .mkString("|", "|", "|"))
      }
    }
    showDf("ta_repetition", SparkEntry.queries("ta_repetition")(spark, sfDir))
    showDf("emb_quantize", SparkEntry.queries("emb_quantize")(spark, sfDir))
    showDf("ta_pii (redaction counts)", SparkEntry.queries("ta_pii")(spark, sfDir))
    showDf("dedup_semantic (SemDeDup cells)", SparkEntry.queries("dedup_semantic")(spark, sfDir))
    showDf("pipeline_decontaminate", SparkEntry.queries("pipeline_decontaminate")(spark, sfDir))
    showDf("pipeline_mix (weighted sources)", SparkEntry.queries("pipeline_mix")(spark, sfDir))
    showDf("ivm_pipeline (join ΔV → agg view)", SparkEntry.queries("ivm_pipeline")(spark, sfDir))
    // round-4 surface: QUALIFY + UPDATE dialect, chunking, CDC, layout
    show(
      """SELECT o_custkey, o_orderkey FROM orders
        |QUALIFY row_number() OVER (PARTITION BY o_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey) = 1
        |ORDER BY o_custkey LIMIT 3""".stripMargin)
    showDf("pipeline_chunk (64-tok windows, 16 overlap)",
      SparkEntry.queries("pipeline_chunk")(spark, sfDir))
    showDf("pipeline_stats (dataset card)", SparkEntry.queries("pipeline_stats")(spark, sfDir))
    showDf("op_profile (per-column profile)", SparkEntry.queries("op_profile")(spark, sfDir))
    showDf("op_multiset_changes (CDC feed)", SparkEntry.queries("op_multiset_changes")(spark, sfDir))
    showDf("dedup_incremental (delta vs index)", SparkEntry.queries("dedup_incremental")(spark, sfDir))
    showDf("op_zorder (layout clustering key)", SparkEntry.queries("op_zorder")(spark, sfDir))
    // reference-format EXPLAIN (4-column logical tree); Spark's physical
    // plan remains under EXPLAIN FORMATTED
    show("EXPLAIN SELECT count(*) FROM lineitem WHERE l_quantity < 10", limit = 12)

    spark.stop()
  }
}
