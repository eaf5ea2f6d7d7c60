package graft.operators

import graft.{Det, Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch-equivalent verify queries for the streaming surface
  * (SURVEY §2d). The same transforms run incrementally in
  * graft.streaming.EventsStream; Spark's unified batch/stream model
  * means these oracle-checked plans are the stream's correctness
  * reference.
  */
object Streaming {

  // ---- stream_windowed_agg: hourly tumbling windows per type ----

  private def windowedAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.streaming.EventsStream.windowedAgg(Tables(spark, dir).events)
      .orderBy($"bucket_start", $"event_type")
  }

  private val windowedAggSql =
    s"""SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket_start,
       |  event_type,
       |  COUNT(*) AS n_events,
       |  ${Det.dsumSql("value")} AS total_value
       |FROM events
       |GROUP BY bucket_start, event_type
       |ORDER BY bucket_start, event_type""".stripMargin

  // ---- stream_sessionize: 30-min-gap sessions (batch window form) ----
  // The flatMapGroupsWithState variant lives in EventsStream; this
  // window-function formulation is its deterministic batch oracle.

  private def sessionize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(spark, dir).events
      .withColumn("prev_us", lag(unix_micros($"ts"), 1).over(w))
      .withColumn("is_new",
        when($"prev_us".isNull ||
          unix_micros($"ts") - $"prev_us" > 1800000000L, 1L).otherwise(0L))
      .withColumn("session_idx", sum($"is_new").over(wRun))
      .groupBy($"user_id", $"session_idx")
      .agg(
        min($"ts").as("session_start"),
        max($"ts").as("session_end"),
        count(lit(1)).as("n_events"),
        Det.dsum($"value").as("total_value"))
      .orderBy($"user_id", $"session_idx")
  }

  private val sessionizeSql =
    s"""WITH e AS (
       |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value
       |  FROM events),
       |m AS (
       |  SELECT *,
       |    CASE WHEN LAG(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
       |           OR epoch_us(ts) - LAG(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
       |         THEN 1 ELSE 0 END AS is_new
       |  FROM e),
       |s AS (
       |  SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
       |  FROM m)
       |SELECT user_id, session_idx,
       |  MIN(ts) AS session_start,
       |  MAX(ts) AS session_end,
       |  COUNT(*) AS n_events,
       |  ${Det.dsumSql("value")} AS total_value
       |FROM s
       |GROUP BY user_id, session_idx
       |ORDER BY user_id, session_idx""".stripMargin

  val all: Seq[Q] = Seq(
    Q("stream_windowed_agg", windowedAgg, Some(windowedAggSql)),
    Q("stream_sessionize", sessionize, Some(sessionizeSql))
  )
}
