package graft.streaming

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class StreamingDedupSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("content duplicates within the watermark horizon are dropped; normalization folds case/spacing") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val out = StreamingDedup.dedupByContent(
      input.toDF().toDF("doc_id", "ts", "text"), delay = "10 minutes")
    val q = out.writeStream
      .outputMode(OutputMode.Append)
      .format("memory")
      .queryName("dedup_test")
      .start()
    try {
      // batch 1: two distinct docs + an in-batch duplicate
      input.addData(
        (1L, ts("2024-01-01 10:00:00"), "the quick brown fox"),
        (2L, ts("2024-01-01 10:00:30"), "the quick brown fox"),
        (3L, ts("2024-01-01 10:01:00"), "a different document"))
      q.processAllAvailable()
      // batch 2: a duplicate in a later batch (state still within horizon)
      // that differs only by case/extra spaces — the normalized key matches
      input.addData((4L, ts("2024-01-01 10:02:00"), "  The  QUICK brown fox ")) // dup of 1
      input.addData((5L, ts("2024-01-01 10:03:00"), "fresh content entirely"))
      q.processAllAvailable()
      val ids = sp.table("dedup_test").collect().map(_.getAs[Long]("doc_id")).sorted
      assert(ids.toSeq === Seq(1L, 3L, 5L), s"got ${ids.mkString(",")}")
      // survivors carry the fingerprint column for downstream batch dedup
      assert(sp.table("dedup_test").columns.contains("fp"))
    } finally q.stop()
  }
}
