package graft.model

import org.apache.spark.sql.types._

/** Explicit schemas + case classes for the engine's public contract.
  *
  * Mirrors the reference's two tables and the Binance kline layout
  * (reference: dags/dag_btc_daily.py:76-80 kline columns,
  * :138-144 raw_prices DDL, :203-217 daily_metrics DDL). Schemas are
  * always declared, never inferred — the reference declares its DDL
  * explicitly and so do we.
  */
object Schemas {

  /** One hourly (or any-grain) price observation — the append-only fact
    * table `raw_prices` (dag_btc_daily.py:138-144). `tsUtc` is a real
    * timestamp, not the reference's ISO string (SURVEY.md §1.2).
    */
  final case class RawPrice(ts_utc: java.sql.Timestamp, asset: String, price: Double)

  /** One row per (date, asset) — the keyed aggregate table
    * `daily_metrics` (dag_btc_daily.py:203-217), generalized to
    * multi-asset. Indicator columns are nullable until their windows
    * fill (min_periods semantics, dag_btc_daily.py:264-267).
    */
  final case class DailyMetric(
      date: java.sql.Date,
      asset: String,
      open: Double,
      high: Double,
      low: Double,
      close: Double,
      ret: Option[Double],
      ma7: Option[Double],
      ma30: Option[Double],
      vol30: Option[Double])

  /** Binance kline REST payload row (dag_btc_daily.py:76-80): numeric
    * price/volume fields arrive as STRINGS and must be cast (dag:89).
    */
  val klineSchema: StructType = StructType(Seq(
    StructField("open_time", LongType, nullable = false),
    StructField("open", StringType),
    StructField("high", StringType),
    StructField("low", StringType),
    StructField("close", StringType),
    StructField("volume", StringType),
    StructField("close_time", LongType),
    StructField("qav", StringType),
    StructField("num_trades", LongType),
    StructField("taker_base_vol", StringType),
    StructField("taker_quote_vol", StringType),
    StructField("ignore", StringType)))

  /** Per-day CSV batch file schema (dag_btc_daily.py:92-95): ISO-8601
    * string timestamp + double price, header row.
    */
  val rawCsvSchema: StructType = StructType(Seq(
    StructField("ts_utc", StringType, nullable = false),
    StructField("price", DoubleType, nullable = false)))

  /** JSONL shard schema for the documents corpus — the declared-schema
    * contract for `Warehouse.readJsonl` (never inferSchema).
    */
  val documentsJsonlSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** raw_prices fact-table schema (dag_btc_daily.py:138-144) with a
    * real timestamp type.
    */
  val rawPricesSchema: StructType = StructType(Seq(
    StructField("ts_utc", TimestampType, nullable = false),
    StructField("asset", StringType, nullable = false),
    StructField("price", DoubleType, nullable = false)))

  /** daily_metrics schema (dag_btc_daily.py:203-217) + asset key for
    * the multi-asset generalization.
    */
  val dailyMetricsSchema: StructType = StructType(Seq(
    StructField("date", DateType, nullable = false),
    StructField("asset", StringType, nullable = false),
    StructField("open", DoubleType),
    StructField("high", DoubleType),
    StructField("low", DoubleType),
    StructField("close", DoubleType),
    StructField("ret", DoubleType),
    StructField("ma7", DoubleType),
    StructField("ma30", DoubleType),
    StructField("vol30", DoubleType)))
}
