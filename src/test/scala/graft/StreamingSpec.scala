package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.Event

/** Streaming/batch agreement: the streaming rollup over a MemoryStream
  * must produce exactly the batch rollup of the same rows, including
  * out-of-order arrival; typed sessionization must track gap logic. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("streaming hourly rollup equals batch aggregation of same data") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    // out-of-order within the watermark: 10:59 arrives after 11:30
    mem.addData(
      Event(0, ts("2024-01-01 10:15:00"), 1, "click", 1.5),
      Event(1, ts("2024-01-01 11:30:00"), 2, "click", 2.5),
      Event(2, ts("2024-01-01 10:59:00"), 1, "view", 4.0),
      Event(3, ts("2024-01-01 11:45:00"), 1, "click", 8.0))
    val out = StreamingOps.runRollupOnce(spark, mem.toDF(), "rollup_sink")
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    val h10 = ts("2024-01-01 10:00:00").getTime / 1000
    val h11 = ts("2024-01-01 11:00:00").getTime / 1000
    assert(out((h10, "click")) === ((1L, 1.5)))
    assert(out((h10, "view")) === ((1L, 4.0)))
    assert(out((h11, "click")) === ((2L, 10.5)))
  }

  test("typed sessionization state machine: gap starts a new session") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = StreamingOps.sessionize(mem.toDS())
      .writeStream.format("memory").queryName("sess_sink")
      .outputMode(OutputMode.Update()).start()
    mem.addData(
      Event(0, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
      Event(1, ts("2024-01-01 10:10:00"), 1, "click", 1.0))
    q.processAllAvailable()
    val afterBatch1 = spark.table("sess_sink").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(afterBatch1.contains((1L, 2L))) // one session, 2 events

    mem.addData(Event(2, ts("2024-01-01 11:30:00"), 1, "click", 1.0))
    q.processAllAvailable()
    q.stop()
    val latest = spark.table("sess_sink").collect()
      .filter(_.getLong(0) == 1L).maxBy(_.getLong(2))
    // 80-minute gap → the state reset to a fresh 1-event session
    assert(latest.getLong(1) === 1L)
  }
}
