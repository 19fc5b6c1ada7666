package graft.streaming

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class StreamingCorpusGateSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  // a doc that clears every gate: long enough, stopword-rich, no PII
  private val goodProse =
    ("the quick brown fox jumps over a lazy dog and it runs to the river " +
      "where the water is cold and the light of morning falls in long lines").trim

  test("hygiene gates fire identically on a stream; survivors carry quality_score") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val out = StreamingCorpusGate.gate(input.toDF().toDF("doc_id", "ts", "text"))
    val q = out.writeStream
      .outputMode(OutputMode.Append)
      .format("memory")
      .queryName("gate_test")
      .start()
    try {
      input.addData(
        (1L, ts("2024-01-01 10:00:00"), goodProse),
        (2L, ts("2024-01-01 10:00:10"), "hi"), // too short → quality gate
        (3L, ts("2024-01-01 10:00:20"), Seq.fill(40)("spam").mkString(" ")), // repetition gate
        (4L, ts("2024-01-01 10:00:30"), goodProse + " write to bob@example.com now")) // PII gate
      q.processAllAvailable()
      // a later micro-batch passes the same gates — stateless, no horizon
      input.addData((5L, ts("2024-01-01 11:00:00"), goodProse + " and then some more of it"))
      q.processAllAvailable()
      val rows = sp.table("gate_test").collect()
      assert(rows.map(_.getAs[Long]("doc_id")).sorted.toSeq === Seq(1L, 5L))
      assert(rows.forall(_.getAs[Double]("quality_score") >= 0.2))
      // the stream emits the NORMALIZED text, same as the batch stage
      assert(rows.forall(r => r.getAs[String]("text") == r.getAs[String]("text").toLowerCase))
    } finally q.stop()
  }

  test("stream and batch gates are the same code path — identical survivors") {
    val sp = spark
    import sp.implicits._
    val batch = Seq(
      (1L, goodProse),
      (2L, "hi"),
      (3L, Seq.fill(40)("spam").mkString(" ")),
      (4L, goodProse + " write to bob@example.com now")).toDF("doc_id", "text")
    val survivors = StreamingCorpusGate.gate(batch).select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(survivors === Seq(1L))
  }
}
