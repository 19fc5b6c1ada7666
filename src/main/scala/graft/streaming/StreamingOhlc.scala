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

  /** readStream → watermark → 1-day tumbling OHLC, shared by both
    * sinks below.
    */
  private def ohlcStream(spark: SparkSession, eventsPath: String, queryName: String): DataFrame = {
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
    stream
      .groupBy(window(col("ts_utc"), "1 day").as("w"), col("asset"))
      .agg(
        min_by(col("price"), col("ts_utc")).as("open"),
        max(col("price")).as("high"),
        min(col("price")).as("low"),
        max_by(col("price"), col("ts_utc")).as("close"))
      .select(col("w.start").cast("date").as("date"), col("asset"),
        col("open"), col("high"), col("low"), col("close"))
  }

  /** Bounded replay into an in-memory table: complete output mode so
    * the memory sink holds every window.
    */
  def run(spark: SparkSession, eventsPath: String, queryName: String): DataFrame = {
    val q = ohlcStream(spark, eventsPath, queryName).writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(queryName)
  }

  /** Production sink shape: update-mode micro-batches merged into a
    * date-partitioned parquet warehouse via keyed upsert + dynamic
    * partition overwrite — each batch rewrites ONLY the date
    * partitions it touches (late/replayed data restates its own day),
    * the streaming analog of the reference's per-day ON CONFLICT
    * upsert (dag_btc_daily.py:219-230).
    */
  def runIncremental(spark: SparkSession, eventsPath: String,
                     warehouseDir: String, queryName: String): DataFrame = {
    import graft.store.Warehouse
    val q = ohlcStream(spark, eventsPath, queryName).writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val b = batch.withColumn("date", col("date").cast("string"))
          val exists = new java.io.File(warehouseDir).exists()
          val merged = if (exists) {
            val dates = b.select("date").distinct()
            val existing = spark.read.parquet(warehouseDir)
              .withColumn("date", col("date").cast("string"))
              .join(broadcast(dates), Seq("date"), "left_semi") // only touched partitions
            Warehouse.upsert(existing, b, keys = Seq("date", "asset"),
              updateCols = Seq("open", "high", "low", "close"))
          } else b
          Warehouse.overwritePartitions(merged, warehouseDir, Seq("date"))
        }
        ()
      }
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.read.parquet(warehouseDir)
  }
}
