package graft.queries

import graft.{Engine, QueryDef}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Event-stream analytics over the `events` table: time-bucketed
  * aggregation, analytic window functions, and gap-based sessionization —
  * each expressed so the identical logic runs as a DuckDB oracle.
  * (The Structured Streaming versions of these transforms live in
  * graft.streaming.Streams; StreamingSpec proves batch ≡ streaming.)
  */
object Events {

  // --- tumbling 1-hour aggregation (batch form of Streams.hourlyByType) ---
  val windowAgg: QueryDef = QueryDef.sqlBacked(
    "evt_window_agg",
    """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start, event_type,
      |  count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
      |FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type""".stripMargin
  ) { (spark, dir) =>
    Engine.table(spark, dir, "events")
      .groupBy(
        date_trunc("hour", col("ts")).cast(TimestampNTZType).as("hour_start"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(12, 2))).cast(DoubleType).as("total"))
      .orderBy(col("hour_start"), col("event_type"))
  }

  // --- analytic window functions (Spark-native extension) -----------------
  val windowRank: QueryDef = QueryDef.sqlBacked(
    "evt_window_rank",
    """SELECT event_id, user_id,
      |  CAST(row_number() OVER w AS INT) AS rn,
      |  CAST(rank() OVER (PARTITION BY user_id ORDER BY event_type) AS INT) AS rnk,
      |  lag(event_id) OVER w AS prev_event,
      |  lead(event_id) OVER w AS next_event,
      |  CAST(sum(CAST(value AS DECIMAL(12,2))) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY user_id, rn""".stripMargin
  ) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wRank = Window.partitionBy(col("user_id")).orderBy(col("event_type"))
    Engine.table(spark, dir, "events").select(
      col("event_id"), col("user_id"),
      row_number().over(w).as("rn"),
      rank().over(wRank).as("rnk"),
      lag(col("event_id"), 1).over(w).as("prev_event"),
      lead(col("event_id"), 1).over(w).as("next_event"),
      sum(col("value").cast(DecimalType(12, 2)))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast(DoubleType).as("running_total"))
      .orderBy(col("user_id"), col("rn"))
  }

  // --- gap-based sessionization, closed-form (lag + running sum) ----------
  // The declarative twin of Streams.sessionize: a new session starts when
  // the gap to the previous event exceeds 30 minutes.
  val sessionize: QueryDef = QueryDef.sqlBacked(
    "evt_sessionize",
    """SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
      |  CAST(count(*) AS BIGINT) AS n_events,
      |  min(ts) AS start_ts, max(ts) AS end_ts
      |FROM (
      |  SELECT user_id, ts,
      |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM (
      |    SELECT user_id, ts, event_id,
      |      CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |                OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |                   > INTERVAL 30 MINUTE
      |           THEN 1 ELSE 0 END AS new_sess
      |    FROM events) marked) sessions
      |GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin
  ) { (spark, dir) =>
    Engine.table(spark, dir, "events").createOrReplaceTempView("events")
    spark.sql(
      """SELECT user_id, session_id, CAST(count(*) AS BIGINT) AS n_events,
        |  min(ts) AS start_ts, max(ts) AS end_ts
        |FROM (
        |  SELECT user_id, ts,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM (
        |    SELECT user_id, ts, event_id,
        |      CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |                OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |                   > INTERVAL '30' MINUTE
        |           THEN 1 ELSE 0 END AS new_sess
        |    FROM events) marked) sessions
        |GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin)
  }

  val all: Seq[QueryDef] = Seq(windowAgg, windowRank, sessionize)
}
