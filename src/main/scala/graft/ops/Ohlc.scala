package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Daily OHLC aggregation — the reference's `compute_daily_metrics`
  * analytical core (dag_btc_daily.py:195-199): over one day's
  * ts-ordered prices, open = first by ts, high = max, low = min,
  * close = last by ts.
  *
  * The reference computes one (day, asset) per run with positional
  * `iloc[0]/iloc[-1]` after a sort; the Spark-native form is a single
  * hash aggregate over ALL days and assets using `min_by`/`max_by`
  * (argmin/argmax over the ordering key), which needs no sort at all:
  * Catalyst plans partial+final HashAggregate with map-side combine,
  * so the shuffle carries one row per (date, asset) group, not the raw
  * rows. At 100 TB this is the only scalable shape — a sort-based
  * first/last would force a total order per group.
  */
object Ohlc {

  /** df must have columns (ts_utc: timestamp, asset: string,
    * price: double); output one row per (date, asset).
    */
  def daily(df: DataFrame): DataFrame =
    df.groupBy(to_date(col("ts_utc")).as("date"), col("asset"))
      .agg(
        min_by(col("price"), col("ts_utc")).as("open"),
        max(col("price")).as("high"),
        min(col("price")).as("low"),
        max_by(col("price"), col("ts_utc")).as("close"))

  /** Calendar-week resample (pandas `resample('W')` analog, Monday
    * start to match ANSI `date_trunc('week')`): same single hash
    * aggregate as [[daily]], coarser bucket — open/close are argmin/
    * argmax by raw timestamp WITHIN the week, so no daily intermediate
    * and no sort. One shuffle of (week, asset) partials at any scale.
    */
  def weekly(df: DataFrame): DataFrame =
    df.groupBy(date_trunc("week", col("ts_utc")).cast("date").as("week"), col("asset"))
      .agg(
        min_by(col("price"), col("ts_utc")).as("open"),
        max(col("price")).as("high"),
        min(col("price")).as("low"),
        max_by(col("price"), col("ts_utc")).as("close"))
}
