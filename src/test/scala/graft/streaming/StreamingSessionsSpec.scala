package graft.streaming

import graft.SparkSpec
import graft.streaming.StreamingSessions.Evt
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class StreamingSessionsSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("flatMapGroupsWithState sessionization: session closes when watermark passes end+gap") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val input = MemoryStream[Evt]
    val sessions = StreamingSessions.sessions(
      input.toDS().withWatermark("ts", "0 seconds"), gapSec = 1800L)
    val q = sessions.writeStream
      .outputMode(OutputMode.Append)
      .format("memory")
      .queryName("sess_test")
      .start()
    try {
      // batch 1: two events 10 min apart (one open session for user 7)
      input.addData(
        Evt(7L, ts("2024-01-01 10:00:00"), 1L),
        Evt(7L, ts("2024-01-01 10:10:00"), 2L))
      q.processAllAvailable()
      assert(sp.table("sess_test").count() === 0) // still open
      // batch 2: event 2h later → watermark jumps past 10:10+30min,
      // timeout fires and closes session 0; the new event opens session 1
      input.addData(Evt(7L, ts("2024-01-01 12:10:00"), 3L))
      q.processAllAvailable()
      // one more batch so the timeout (based on the advanced watermark) triggers
      input.addData(Evt(8L, ts("2024-01-01 13:00:00"), 4L))
      q.processAllAvailable()
      val closed = sp.table("sess_test").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_id"),
          r.getAs[Long]("n_events"), r.getAs[Timestamp]("session_end")))
      assert(closed.contains((7L, 0L, 2L, ts("2024-01-01 10:10:00"))),
        s"expected closed session 0 for user 7, got: ${closed.mkString(", ")}")
    } finally q.stop()
  }

  test("in-batch gap splits into closed + open sessions immediately") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val input = MemoryStream[Evt]
    val q = StreamingSessions.sessions(
      input.toDS().withWatermark("ts", "0 seconds"), gapSec = 60L)
      .writeStream.outputMode(OutputMode.Append).format("memory")
      .queryName("sess_test2").start()
    try {
      input.addData(
        Evt(1L, ts("2024-01-01 00:00:00"), 1L),
        Evt(1L, ts("2024-01-01 00:00:30"), 2L),
        Evt(1L, ts("2024-01-01 00:05:00"), 3L)) // >60s after previous → split
      q.processAllAvailable()
      val closed = sp.table("sess_test2").collect()
      assert(closed.length === 1)
      assert(closed.head.getAs[Long]("session_id") === 0L)
      assert(closed.head.getAs[Long]("n_events") === 2L)
    } finally q.stop()
  }
}
