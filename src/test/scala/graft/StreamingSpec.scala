package graft

import graft.streaming.Streaming

class StreamingSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  lazy val events = spark.read.parquet(s"$sfTiny/events.parquet").cache()

  test("streaming windowed agg equals the batch form (memory sink replay)") {
    val batch = Streaming.windowedAggBatch(events).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toSet
    val sdf = Streaming.windowedAggStream(spark, events)
    val q = sdf.writeStream.outputMode("complete")
      .format("memory").queryName("win_out").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("win_out").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toSet
    assert(streamed == batch)
  }

  test("stateful sessionization (mapGroupsWithState) equals the window-lag batch form") {
    val batch = Streaming.sessionizeBatch(events).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val stateful = Streaming.sessionizeStateful(
        events.select(col("event_id"), col("ts").cast("timestamp").as("ts"),
          col("user_id"), col("event_type"), col("value")).as[Streaming.Event])
      .collect().map(s => (s.user_id, s.n_events, s.n_sessions)).toSet
    assert(stateful == batch)
  }

  test("session counts are sane: 1 <= sessions <= events") {
    Streaming.sessionizeBatch(events).collect().foreach { r =>
      assert(r.getLong(2) >= 1 && r.getLong(2) <= r.getLong(1))
    }
  }
}
