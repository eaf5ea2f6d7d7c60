package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured-Streaming surface (SURVEY §2d): the reference's
  * dashboard consumes a continuously-refreshed metrics table; here
  * the same aggregations run incrementally over an event stream.
  *
  * The transform functions are written against plain DataFrames so
  * the *identical* logical plan serves batch (Verify/oracle) and
  * streaming (readStream + watermark) — Spark's unified model makes
  * the batch query the correctness oracle for the stream.
  */
object EventsStream {

  /** events.parquet physical schema (ts is TIMESTAMP(NANOS), read as
    * long via the legacy conf and truncated to micros).
    */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  def readStreamEvents(spark: SparkSession, dir: String): DataFrame = {
    // nanosAsLong comes from GraftSession at session-build time
    // the source is a single file; streaming file sources need a
    // directory, so point at the dir and glob-filter to events
    spark.readStream.schema(rawSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }

  /** Hourly tumbling-window aggregation per event type. Used by the
    * `stream_windowed_agg` verify query (batch) and the streaming
    * smoke test (with watermark + memory sink).
    */
  def windowedAgg(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    events
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n_events"),
        graft.Det.dsum($"value").as("total_value"))
      .select($"window.start".as("bucket_start"), $"event_type",
        $"n_events", $"total_value")
  }

  def windowedAggStreaming(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    windowedAgg(events.withWatermark("ts", "2 hours"))
  }

  /** Streaming exact dedup on event_id — the streaming twin of
    * dedup_exact. dropDuplicatesWithinWatermark is the form whose
    * state is actually bounded by the watermark: plain
    * dropDuplicates(key) without the event-time column in the key
    * keeps one state entry per distinct id forever.
    */
  def dedupStreaming(events: DataFrame): DataFrame =
    events.withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")

  // ---- stateful sessionization (flatMapGroupsWithState) ----

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)
  case class SessionState(start: Long, last: Long, n: Long, total: Double)
  case class Session(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long, total_value: Double)

  val gapMicros: Long = 30L * 60 * 1000 * 1000

  /** Streaming sessionizer: emits a session when a user is idle past
    * the gap (event-time timeout would be used with a watermark; the
    * local smoke test flushes remaining state at end of input).
    */
  def sessionize(events: Dataset[Event]): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, evs: Iterator[Event], state: GroupState[SessionState]) =>
          // Sort within the group: local smoke feeds one batch; a
          // production stream relies on the watermark for order.
          // micros, not getTime*1000: Timestamp.getTime is millis and
          // would zero the sub-millisecond component the batch oracle
          // keeps (a 30min+500us gap must still open a new session)
          def micros(ts: java.sql.Timestamp): Long =
            ts.getTime * 1000 + (ts.getNanos / 1000) % 1000
          // full-precision emit: new Timestamp(us/1000) alone would
          // truncate to millis and lose the sub-ms component the
          // batch oracle (min/max ts) keeps
          def toTs(us: Long): java.sql.Timestamp = {
            val t = new java.sql.Timestamp(us / 1000)
            t.setNanos(((us % 1000000) * 1000).toInt)
            t
          }
          val sorted = evs.toSeq.sortBy(e => (micros(e.ts), e.event_id))
          var sessions = List.empty[Session]
          var cur = state.getOption
          for (e <- sorted) {
            val t = micros(e.ts)
            cur match {
              case Some(s) if t - s.last > gapMicros =>
                sessions ::= Session(userId, toTs(s.start), toTs(s.last),
                  s.n, s.total)
                cur = Some(SessionState(t, t, 1, e.value))
              case Some(s) =>
                cur = Some(SessionState(s.start, t, s.n + 1, s.total + e.value))
              case None =>
                cur = Some(SessionState(t, t, 1, e.value))
            }
          }
          cur.foreach(state.update)
          sessions.reverse.iterator
      }
  }
}
