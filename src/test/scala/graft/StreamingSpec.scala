package graft

import org.apache.spark.sql.functions._
import graft.streaming.Events

/** Structured Streaming: the streaming path must agree with the identical
  * batch transform (same code, incremental execution). */
class StreamingSpec extends SparkSpec {
  import spark.implicits._
  initLogs()

  test("streaming hourlyStats over parquet equals the batch result") {
    val batchEvents = Tables.events(spark, sfSmoke)
    // stage µs-normalized events so readStream sees a plain timestamp
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    batchEvents.write.mode("overwrite").parquet(dir)
    val expected = Events.hourlyStats(spark.read.parquet(dir))
      .orderBy("window_start", "event_type")
      .collect().map(_.toSeq).toSeq
    val got = Events.runStreamToMemory(spark, dir, "hourly_smoke")
      .orderBy("window_start", "event_type")
      .collect().map(_.toSeq).toSeq
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("sessionize agrees with the batch gaps-and-islands query") {
    val ev = Tables.events(spark, sfSmoke)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[Events.Event]
    val sessions = Events.sessionize(ev)
    val perUser = sessions.groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), sum("n_events").as("n_events"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val batch = SparkEntry.queries("q51_sessions")(spark, sfSmoke)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(perUser == batch)
  }

  test("watermark + sliding windows plan and execute") {
    val ev = Tables.events(spark, sfSmoke)
    val slid = Events.slidingStats(Events.withLateData(ev))
    assert(slid.count() > 0)
  }
}
