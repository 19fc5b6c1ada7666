package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming form of the daily OHLC pipeline (SURVEY.md
  * §2.7): the reference simulates a stream with Airflow daily batches
  * + catchup; the Spark-native form is `readStream` → 1-day tumbling
  * window per asset → min_by/max_by OHLC.
  *
  * Watermarking: 1 day of allowed lateness mirrors the reference's
  * tolerance for late/replayed data (its unique index silently drops
  * replays). In production the sink is `foreachBatch` MERGE into
  * daily_metrics (keyed upsert, Warehouse.upsert); indicators stay a
  * batch pass over the small aggregate table after each micro-batch,
  * exactly as the reference rewrites the whole table per run —
  * 30-row trailing windows over a total order aren't incrementalizable.
  */
object StreamingOhlc {

  /** events.parquet raw schema — ts read as nanosecond long (the file
    * is TIMESTAMP(NANOS); see Tables.events).
    */
  private val eventsRawSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Streaming daily OHLC over a parquet directory/file of events.
    * Complete output mode so the memory sink holds every window —
    * appropriate for a bounded replay; production uses append +
    * watermark with foreachBatch upsert.
    */
  def run(spark: SparkSession, eventsPath: String, queryName: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.streaming.schemaInference", "false")
    // the file streaming source monitors a DIRECTORY; when handed a
    // single parquet file, stage a dir with a symlink to it
    val src = new java.io.File(eventsPath)
    val streamDir =
      if (src.isFile) {
        val d = java.nio.file.Files.createTempDirectory(s"graft_stream_$queryName")
        java.nio.file.Files.createSymbolicLink(d.resolve(src.getName), src.toPath)
        d.toString
      } else eventsPath
    val stream = spark.readStream
      .schema(eventsRawSchema)
      .parquet(streamDir)
      .select(timestamp_micros(expr("ts div 1000")).as("ts_utc"),
        col("event_type").as("asset"), col("value").as("price"))
      .withWatermark("ts_utc", "1 day")
    val ohlc = stream
      .groupBy(window(col("ts_utc"), "1 day").as("w"), col("asset"))
      .agg(
        min_by(col("price"), col("ts_utc")).as("open"),
        max(col("price")).as("high"),
        min(col("price")).as("low"),
        max_by(col("price"), col("ts_utc")).as("close"))
      .select(col("w.start").cast("date").as("date"), col("asset"),
        col("open"), col("high"), col("low"), col("close"))
    val q = ohlc.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(queryName)
  }
}
