package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided parquet testdata (TESTDATA.md) and
  * the role mapping from the reference's time-series schema onto the
  * `events` table (FIXTURES.md §B): ts→ts_utc, event_type→asset,
  * value→price.
  */
object Tables {

  /** Per-path schema cache. A bare `spark.read.parquet(path)` re-lists
    * the directory and re-reads parquet footers on EVERY call (~80 ms
    * measured, vs ~13 ms with a declared schema) — a metastore would
    * hold the schema; this cache plays that role for path-based reads.
    * Assumes a path's schema is immutable for the life of the process
    * (appends are fine — they don't change the schema); call
    * [[invalidateSchemaCache]] after a schema-changing rewrite.
    */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  def invalidateSchemaCache(): Unit = schemaCache.clear()

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    val schema = schemaCache.computeIfAbsent(path, p => spark.read.parquet(p).schema)
    spark.read.schema(schema).parquet(path)
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
