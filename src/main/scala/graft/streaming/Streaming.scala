package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.expressions.Window

/** Streaming surface of the engine. The reference is batch-only (SURVEY
  * §2.9); these operators are the forward path for streaming ingest: a
  * tumbling-window aggregate and gap-based sessionization, each with a
  * batch-equivalent used by the DuckDB oracle (identical semantics, so the
  * streaming run is verified against the batch result in tests).
  */
object Streaming {

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)
  final case class SessionCount(user_id: Long, n_events: Long, n_sessions: Long)

  /** Session gap in milliseconds — millis (not seconds) so the batch, the
    * stateful, and the SQL-oracle forms all compare the same integer.
    */
  val SessionGapMs = 600000L

  /** Batch form of the tumbling 1-minute window agg (count/min/max — exact
    * values, no float summation).
    */
  def windowedAggBatch(events: DataFrame): DataFrame =
    events.groupBy(
        unix_timestamp(date_trunc("minute", col("ts"))).as("minute_ts"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))

  /** Streaming form: same aggregate over readStream with a watermark.
    * outputMode=complete into a memory sink for deterministic test replay.
    */
  def windowedAggStream(spark: SparkSession, events: DataFrame): DataFrame = {
    val stream = spark.readStream.schema(events.schema)
      .parquet(streamInputPath(events))
    stream
      // parquet NTZ timestamps must become instants before watermarking
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 minute"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
      .select(unix_timestamp(col("window.start")).as("minute_ts"),
        col("event_type"), col("n"), col("min_value"), col("max_value"))
  }

  private def streamInputPath(events: DataFrame): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    events.write.mode("overwrite").parquet(dir)
    dir
  }

  /** Batch sessionization: gap > 10 min starts a new session (lag window). */
  def sessionizeBatch(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .withColumn("t_ms", unix_millis(col("ts").cast("timestamp"))) // events.ts is NTZ
      .withColumn("prev", lag(col("t_ms"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev").isNull || col("t_ms") - col("prev") > SessionGapMs, 1L)
          .otherwise(0L))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("new_sess")).as("n_sessions"))
  }

  final case class SessState(nEvents: Long, nSessions: Long, lastTs: Long)

  /** Stateful sessionization via `mapGroupsWithState` — the custom-state
    * shape (KeyValueGroupedDataset + GroupState) a streaming deployment
    * uses; runs identically on a bounded batch Dataset. Semantics match
    * [[sessionizeBatch]].
    */
  def sessionizeStateful(events: Dataset[Event]): Dataset[SessionCount] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[SessState, SessionCount](GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Event], state: GroupState[SessState]) =>
          val prior = state.getOption.getOrElse(SessState(0L, 0L, Long.MinValue))
          val sorted = it.toVector.sortBy(e => (e.ts.getTime, e.event_id))
          var (n, sessions, lastTs) = (prior.nEvents, prior.nSessions, prior.lastTs)
          sorted.foreach { e =>
            val t = e.ts.getTime // millis
            if (lastTs == Long.MinValue || t - lastTs > SessionGapMs) sessions += 1
            lastTs = t
            n += 1
          }
          state.update(SessState(n, sessions, lastTs))
          SessionCount(uid, n, sessions)
      }
  }
}
