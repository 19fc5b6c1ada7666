package graft.streaming

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

object StreamingJoinSpec {
  final case class Click(user_id: Long, click_ts: Timestamp, click_id: Long)
  final case class Buy(user_id: Long, buy_ts: Timestamp, amount: Double)
}

class StreamingJoinSpec extends SparkSpec {
  import StreamingJoinSpec.{Buy, Click}

  private def ts(s: String) = Timestamp.valueOf(s)

  test("stream-stream interval join: purchases attribute to in-window clicks only") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val clicks = MemoryStream[Click]
    val buys = MemoryStream[Buy]
    val joined = StreamingJoin.attributedPurchases(
      clicks.toDF(), buys.toDF(), window = "1 hour", delay = "0 seconds")
    val q = joined.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("attr_test").start()
    try {
      clicks.addData(
        Click(1L, ts("2024-01-01 10:00:00"), 100L),
        Click(1L, ts("2024-01-01 08:00:00"), 101L), // > 1h before buy: no match
        Click(2L, ts("2024-01-01 10:05:00"), 102L)) // other user
      buys.addData(Buy(1L, ts("2024-01-01 10:30:00"), 42.0))
      q.processAllAvailable()
      val rows = sp.table("attr_test").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("click_id"),
          r.getAs[Double]("amount")))
      assert(rows.toSet === Set((1L, 100L, 42.0)),
        s"expected exactly the in-window same-user click, got ${rows.mkString(", ")}")
    } finally q.stop()
  }

  test("streaming result equals the batch twin on the same data") {
    val sp = spark
    import sp.implicits._
    val clicksData = Seq(
      Click(1L, ts("2024-01-01 10:00:00"), 100L),
      Click(1L, ts("2024-01-01 10:20:00"), 101L),
      Click(3L, ts("2024-01-01 09:59:00"), 103L))
    val buysData = Seq(
      Buy(1L, ts("2024-01-01 10:30:00"), 42.0),
      Buy(3L, ts("2024-01-01 11:30:00"), 7.0)) // 91 min after click: no match
    val batch = StreamingJoin.attributedPurchases(
      clicksData.toDF(), buysData.toDF(), window = "1 hour")
      .collect().map(_.toSeq).toSet

    implicit val sqlCtx = sp.sqlContext
    val cs = MemoryStream[Click]; val bs = MemoryStream[Buy]
    val q = StreamingJoin.attributedPurchases(cs.toDF(), bs.toDF(),
        window = "1 hour", delay = "0 seconds")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("attr_eq").start()
    try {
      cs.addData(clicksData: _*); bs.addData(buysData: _*)
      q.processAllAvailable()
      val streamed = sp.table("attr_eq").collect().map(_.toSeq).toSet
      assert(streamed === batch)
      assert(batch.size === 2) // buy1 × clicks 100+101
    } finally q.stop()
  }

  test("stream-static enrichment join: streaming side joins a broadcast dim without state") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val buys = MemoryStream[Buy]
    val q = buys.toDF().join(org.apache.spark.sql.functions.broadcast(dim), Seq("user_id"), "left")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("enrich_test").start()
    try {
      buys.addData(Buy(1L, ts("2024-01-01 10:00:00"), 5.0), Buy(9L, ts("2024-01-01 10:01:00"), 6.0))
      q.processAllAvailable()
      val rows = sp.table("enrich_test").collect()
        .map(r => (r.getAs[Long]("user_id"), Option(r.getAs[String]("tier")))).toSet
      assert(rows === Set((1L, Some("gold")), (9L, None)))
    } finally q.stop()
  }
}
