package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-provided parquet testdata (TESTDATA.md) and
  * the role mapping from the reference's time-series schema onto the
  * `events` table (FIXTURES.md §B): ts→ts_utc, event_type→asset,
  * value→price.
  */
object Tables {

  /** Reads go through [[graft.store.SchemaCache]] so repeat loads skip
    * parquet footer re-inference (~80 ms each; testdata schemas are
    * immutable for the life of the process).
    */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    graft.store.SchemaCache.read(spark, s"$sfDir/$name.parquet")

  /** [[table]] through [[graft.store.SchemaCache.readWide]]: fanned
    * out to cluster parallelism iff the file layout (row-group count)
    * can't feed it. For call sites whose downstream is CPU-heavy per
    * row — text kernels, JSON parsing, regex audits — where a starved
    * single-row-group scan serializes the whole query on one core.
    * Winners chosen by measurement (FanTest probe, round 6): blanket
    * fan-out regresses ~100/147 queries, so this is opt-in per site.
    */
  def tableWide(spark: SparkSession, sfDir: String, name: String): DataFrame =
    graft.store.SchemaCache.readWide(spark, s"$sfDir/$name.parquet")

  /** [[documents]] fanned out for kernel-bound consumers ([[tableWide]]). */
  def documentsWide(spark: SparkSession, sfDir: String): DataFrame =
    tableWide(spark, sfDir, "documents")

  /** [[events]] fanned out for kernel-bound consumers ([[tableWide]]). */
  def eventsWide(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = tableWide(spark, sfDir, "events")
    df.withColumn("ts", tsToTimestamp(spark, df.schema("ts").dataType))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  /** Normalizes a raw `ts` column to a µs TIMESTAMP whichever way the
    * driver generated the file: parquet TIMESTAMP(NANOS) — which Spark
    * has no type for, so it surfaces as a raw nanos long under the
    * legacy conf and is floor-divided to µs, exactly what DuckDB does
    * reading the same file — or a native µs timestamp (NTZ under the
    * UTC session denotes the same instant, so the cast is a relabel).
    */
  def tsToTimestamp(spark: SparkSession, t: DataType): Column = t match {
    case LongType => timestamp_micros(expr("ts div 1000"))
    case TimestampNTZType =>
      // instant-preserving ONLY because every entry point pins
      // spark.sql.session.timeZone=UTC; assert the OWNING session (not
      // SparkSession.active — a second session in the JVM could differ)
      // rather than silently shift all event timestamps
      val tz = spark.conf.get("spark.sql.session.timeZone")
      require(tz == "UTC",
        s"tsToTimestamp: NTZ->Timestamp relabel requires a UTC session, got $tz")
      col("ts").cast(TimestampType)
    case TimestampType => col("ts")
    case other => throw new IllegalArgumentException(
      s"tsToTimestamp: unexpected raw ts type $other — regenerated " +
        "testdata changed era? (expected TIMESTAMP(NANOS)-as-long, NTZ µs, or UTC µs)")
  }

  /** The raw `ts` type a batch scan of `events.parquet` surfaces —
    * streaming sources declare their schema up front, so they probe
    * this (one cached footer read) instead of hardcoding an era.
    */
  def rawTsType(spark: SparkSession, eventsPath: String): DataType = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    graft.store.SchemaCache.read(spark, eventsPath).schema("ts").dataType
  }

  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(spark, sfDir, "events")
    df.withColumn("ts", tsToTimestamp(spark, df.schema("ts").dataType))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
  }
  def lineitem(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "orders")
  def documents(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")

  /** `events` viewed as the reference's raw_prices fact table
    * (SURVEY.md §1.1 #2): one row per (timestamp, asset) with a double
    * price. (event_type, ts) is unique in the testdata, matching the
    * reference's UNIQUE INDEX (ts_utc, asset) (dag_btc_daily.py:147-150).
    */
  def prices(spark: SparkSession, sfDir: String): DataFrame =
    events(spark, sfDir).select(
      col("ts").as("ts_utc"),
      col("event_type").as("asset"),
      col("value").as("price"))
}
