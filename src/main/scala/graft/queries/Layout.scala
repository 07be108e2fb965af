package graft.queries

import graft.{Engine, QueryDef}

/** Data-layout operators: multi-dimensional clustering of a table's
  * physical order so plain parquet min/max footer stats prune files on
  * more than one predicate column (see functions/ZOrder.scala for the
  * 100 TB story). The oracle replays the bit interleave as 64 explicit
  * shift-and-mask terms — bit-exact, engine-portable integer math.
  */
object Layout {

  /** DuckDB spelling of zorder64: OR of ((x>>i)&1)<<2i and ((y>>i)&1)<<(2i+1)
    * for i in [0,32). Bit 63 is only reachable when y ≥ 2³¹ (not hit by
    * the key ranges queried here, so BIGINT shift semantics never differ). */
  private val duckInterleave: String =
    (0 until 32).flatMap(i => Seq(
      s"(((x >> $i) & 1) << ${2 * i})",
      s"(((y >> $i) & 1) << ${2 * i + 1})")).mkString(" | ")

  private val zorderOracle =
    s"""SELECT l_orderkey, l_partkey, CAST($duckInterleave AS BIGINT) AS z
       |FROM (
       |  SELECT l_orderkey, l_partkey,
       |    CAST(l_orderkey AS BIGINT) AS x, CAST(l_partkey AS BIGINT) AS y
       |  FROM lineitem WHERE l_orderkey < 200) t
       |ORDER BY z, l_orderkey, l_partkey""".stripMargin

  val zorder: QueryDef = QueryDef.sqlBacked("op_zorder", zorderOracle) {
    (spark, dir) =>
      Engine.table(spark, dir, "lineitem").createOrReplaceTempView("lineitem")
      spark.sql(
        """SELECT l_orderkey, l_partkey,
          |  zorder64(CAST(l_orderkey AS BIGINT), CAST(l_partkey AS BIGINT)) AS z
          |FROM lineitem WHERE l_orderkey < 200
          |ORDER BY z, l_orderkey, l_partkey""".stripMargin)
  }

  // --- bucketed co-located join -----------------------------------------
  // The 100 TB fact⋈fact story SCALE.md's join section promises: when
  // orders⋈lineitem outgrows broadcast, bucketing both tables on the
  // join key AT INGEST removes the exchange entirely — every bucket pair
  // joins locally, forever, for every downstream query keyed on
  // orderkey. This operator is that ingest + query surface:
  // `ensureBucketed` writes both sides as Spark bucketed tables
  // (df.write.bucketBy(k, key).sortBy(key)) and the query joins + GROUP
  // BYs on the bucket key, compiling to a plan with ZERO Exchange
  // nodes — scan→SMJ→partial+final agg→TakeOrdered (BucketedJoinSpec
  // pins exactly that; the only sorts left are partition-local — Spark
  // ≥3.0 doesn't propagate bucket sort metadata to the scan,
  // SPARK-28595). repartition(numBuckets, key) before the write uses
  // the same murmur3 hash bucketing uses, so each task holds exactly
  // one bucket's rows → ONE file per bucket.
  // The MERGE hint pins the showcase shape: at gate scale the dimension
  // side fits broadcast, and a BroadcastHashJoin would be the right plan
  // for SMALL orders but proves nothing about the co-location contract
  // this operator exists to demonstrate.
  // Results are layout-independent (same rows as a plain join — the
  // DuckDB oracle is exactly that), so the gate hash-checks semantics
  // while the spec checks the plan.

  /** table suffix → source dir it was last written from (bucketed tables
    * are session-catalog state; a different sfDir must rewrite them). */
  private val bucketedFrom = scala.collection.mutable.Map[String, String]()

  private def ensureBucketed(spark: org.apache.spark.sql.SparkSession,
      dir: String, src: String, key: String, buckets: Int = 8): String =
    synchronized {
      val table = s"graft_bkt_$src"
      if (!bucketedFrom.get(table).contains(dir) ||
          !spark.catalog.tableExists(table)) {
        // A table dropped from the in-memory catalog (or a crashed prior
        // JVM) can leave its warehouse directory behind; CTAS refuses to
        // reuse the location, so clear both sides before writing.
        spark.sql(s"DROP TABLE IF EXISTS $table")
        val wh = spark.conf.get("spark.sql.warehouse.dir")
          .stripPrefix("file:")
        val loc = new java.io.File(wh, table)
        if (loc.exists) {
          def rm(f: java.io.File): Unit = {
            if (f.isDirectory) f.listFiles().foreach(rm)
            f.delete(); ()
          }
          rm(loc)
        }
        Engine.table(spark, dir, src)
          .repartition(buckets, org.apache.spark.sql.functions.col(key))
          .write.format("parquet")
          .bucketBy(buckets, key).sortBy(key)
          .mode("overwrite").saveAsTable(table)
        bucketedFrom(table) = dir
      }
      table
    }

  private val bucketedOracle =
    """SELECT o_orderkey, max(o_orderpriority) AS priority,
      |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) *
      |    (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
      |    AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderkey
      |ORDER BY revenue DESC, o_orderkey LIMIT 50""".stripMargin

  def bucketedJoin(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val lt = ensureBucketed(spark, dir, "lineitem", "l_orderkey")
    val ot = ensureBucketed(spark, dir, "orders", "o_orderkey")
    // cents fixed-point revenue (Tpch.scala's idiom): exact scale-4 long
    // sums inside codegen, finalized cast-then-divide — bit-identical to
    // the oracle's DECIMAL-sum → DOUBLE cast for any |sum| < 2^63.
    spark.sql(
      s"""SELECT /*+ MERGE(l) */ o.o_orderkey,
         |  max(o.o_orderpriority) AS priority,
         |  CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT) *
         |    (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
         |    AS DOUBLE) / 10000.0 AS revenue
         |FROM $lt l JOIN $ot o ON l.l_orderkey = o.o_orderkey
         |GROUP BY o.o_orderkey
         |ORDER BY revenue DESC, o.o_orderkey LIMIT 50""".stripMargin)
  }

  val bucketed: QueryDef =
    QueryDef.sqlBacked("layout_bucketed_join", bucketedOracle)(bucketedJoin)

  val all: Seq[QueryDef] = Seq(zorder, bucketed)
}
