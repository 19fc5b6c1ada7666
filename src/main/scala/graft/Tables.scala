package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
    tableWide(spark, sfDir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark has no type
    * for. Read nanos as raw longs (legacy conf) and floor-divide to
    * microsecond timestamps — exactly what DuckDB does when it reads
    * the same file as its µs TIMESTAMP, so oracle comparisons agree.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, sfDir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
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
