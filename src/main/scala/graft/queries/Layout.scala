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

  val all: Seq[QueryDef] = Seq(zorder)
}
