package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface over the `events` table shape
  * (event_id, ts, user_id, event_type, value, props).
  *
  * The reference engine has NO streaming subsystem (SURVEY.md §2.9 —
  * pure request/response); this module is the Spark-native upgrade
  * path: the same transforms run batch or streaming because they are
  * plain DataFrame ops — `spark.read` vs `spark.readStream` is the
  * only difference, which is the whole point of building on Spark.
  *
  * Scale notes: windowed aggregation state is bounded by the
  * watermark (late data beyond it is dropped, state evicted);
  * sessionization state is per-key and timeout-evicted. Both shuffle
  * once on the grouping key — same plan shape as the batch agg.
  */
object EventStream {

  /** File-based stream over a directory of parquet event files —
    * incremental ingestion of new files (the Spark-idiomatic way to
    * tail a landing zone). */
  def readEvents(spark: SparkSession, dir: String,
                 schemaFrom: String): DataFrame = {
    // `ts` physical type varies by generator version — normalize to
    // TimestampType (watermarks reject NTZ), same contract as
    // graft.Tables.loadEvents
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(schemaFrom).schema
    val raw = spark.readStream.schema(schema).parquet(dir)
    schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }

  /** Tumbling-window per-type counts+sums with a watermark: the
    * canonical streaming aggregation. Works on batch input too
    * (window() is an ordinary grouping expression). */
  def windowedTypeStats(events: DataFrame, windowLen: String,
                        watermark: String = "10 minutes"): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark("ts", watermark)
              else events
    src.groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value")).as("sum_value"))
      .select(col("window.start").as("win_start"),
        col("window.end").as("win_end"),
        col("event_type"), col("cnt"), col("sum_value"))
  }

  /** Event-time gap sessionization via the native `session_window`
    * grouping (merges events whose [ts, ts+gap) windows overlap) —
    * mode-agnostic like `windowedTypeStats`: in streaming mode the
    * watermark bounds session state, in batch mode it is an ordinary
    * aggregation the oracle replays with a lag/cumsum window. */
  def sessionWindows(events: DataFrame, gap: String,
                     watermark: String = "30 minutes"): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark("ts", watermark)
              else events
    src.groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"),
        col("user_id"), col("n_events"), col("sum_value"))
  }

  /** Exactly-once-style dedup for at-least-once sources: drops repeat
    * event_ids arriving within the watermark horizon; state for an id
    * is evicted once the watermark passes it, so memory stays bounded
    * by the horizon instead of the stream's lifetime. */
  def dedupEvents(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                   event_type: String, value: Double)
  case class Session(user_id: Long, n_events: Long, total_value: Double,
                     closed: Boolean)

  /** Custom per-key state via mapGroupsWithState: running per-user
    * session rollup with processing-time timeout — the
    * KeyValueGroupedDataset state API the prompt's streaming surface
    * calls for. */
  def sessionize(events: Dataset[Event],
                 timeout: String = "30 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[Session, Session](
        GroupStateTimeout.ProcessingTimeTimeout) {
        case (uid, it, state: GroupState[Session]) =>
          if (state.hasTimedOut) {
            val s = state.get.copy(closed = true)
            state.remove()
            s
          } else {
            val prev = state.getOption.getOrElse(Session(uid, 0L, 0.0, closed = false))
            val evs = it.toSeq
            val next = prev.copy(
              n_events = prev.n_events + evs.size,
              total_value = prev.total_value + evs.map(_.value).sum)
            state.update(next)
            state.setTimeoutDuration(timeout)
            next
          }
      }
  }

  /** Sink: append to a parquet dir with checkpointing (swap for Delta
    * `foreachBatch MERGE` when a transactional store is available). */
  def writeParquet(df: DataFrame, outDir: String, checkpointDir: String,
                   mode: OutputMode = OutputMode.Append()) =
    df.writeStream
      .outputMode(mode)
      .option("checkpointLocation", checkpointDir)
      .format("parquet")
      .option("path", outDir)
}
