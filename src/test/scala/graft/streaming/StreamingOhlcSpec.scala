package graft.streaming

import graft.{SparkSpec, Tables}
import graft.ops.Ohlc
import org.apache.spark.sql.functions._

class StreamingOhlcSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("incremental foreachBatch merge equals the batch OHLC") {
    val wh = java.nio.file.Files.createTempDirectory("graft_stream_wh").toString + "/ohlc"
    val streamed = StreamingOhlc.runIncremental(spark, s"$dir/events.parquet", wh, "ohlc_inc_test")
      .withColumn("date", col("date").cast("string"))
      .collect()
      .map(r => (r.getAs[String]("date"), r.getAs[String]("asset")) ->
        (r.getAs[Double]("open"), r.getAs[Double]("high"), r.getAs[Double]("low"), r.getAs[Double]("close")))
      .toMap
    val batch = Ohlc.daily(Tables.prices(spark, dir))
      .collect()
      .map(r => (r.getAs[java.sql.Date]("date").toString, r.getAs[String]("asset")) ->
        (r.getAs[Double]("open"), r.getAs[Double]("high"), r.getAs[Double]("low"), r.getAs[Double]("close")))
      .toMap
    assert(streamed === batch)
    // warehouse is date-partitioned on disk
    assert(new java.io.File(wh).listFiles().exists(_.getName.startsWith("date=")))
  }
}
