package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rolling-window indicators — the reference's `enrich_indicators`
  * (dag_btc_daily.py:264-267):
  *
  *   ret   = close.pct_change()                      (row-based lag, NOT calendar)
  *   ma7   = close.rolling(7,  min_periods=7).mean()
  *   ma30  = close.rolling(30, min_periods=30).mean()
  *   vol30 = ret.rolling(30,   min_periods=30).std()  (pandas ddof=1 → sample stddev)
  *
  * Subtleties preserved (SURVEY.md §2.5, the one place a naive Spark
  * translation is WRONG):
  *  - min_periods: a bare windowed avg would emit partial means for the
  *    first n-1 rows; the `count(...) >= n` guard nulls them out.
  *  - vol30's frame counts non-null `ret` values (pandas rolling count
  *    skips NaN), so vol30's first non-null row lags ma30's by one
  *    (the first ret is NULL).
  *  - stddev_samp = pandas default ddof=1.
  *  - pct_change is ROW-based: a gap in dates still yields a 1-row lag.
  *
  * Scale note: windows partition by asset. The reference is
  * single-asset (one global order — inherently serial); per-asset
  * partitioning restores parallelism at multi-asset scale, and the
  * input here is the daily aggregate table (one row per day per
  * asset), orders of magnitude smaller than raw data — the same
  * tiering the reference uses (recompute only over daily_metrics,
  * dag_btc_daily.py:254-258).
  */
object Indicators {

  /** daily must have (date, asset, close, ...); appends ret/ma7/ma30/vol30. */
  def enrich(daily: DataFrame): DataFrame = {
    val w = Window.partitionBy("asset").orderBy("date")
    val w7 = w.rowsBetween(-6, 0)
    val w30 = w.rowsBetween(-29, 0)
    daily
      .withColumn("ret", col("close") / lag("close", 1).over(w) - 1)
      .withColumn("ma7", guarded(avg(col("close")).over(w7), count(col("close")).over(w7), 7))
      .withColumn("ma30", guarded(avg(col("close")).over(w30), count(col("close")).over(w30), 30))
      .withColumn("vol30", guarded(stddev_samp(col("ret")).over(w30), count(col("ret")).over(w30), 30))
  }

  /** pandas min_periods: emit NULL until `cnt` non-null rows are in frame. */
  private def guarded(value: Column, cnt: Column, minPeriods: Int): Column =
    when(cnt >= minPeriods, value)

  /** Exact rolling median of price over the trailing `window` rows per
    * asset (min_periods = window, same guard discipline as ma30) — the
    * robust-center sibling of the mean indicators: outlier ticks move
    * ma30 but not med30. Rounded to 6 dp for engine portability.
    *
    * Shape: `percentile(0.5)` as a window aggregate — the frame's
    * values are buffered and selected per row, O(w log w) on a
    * 30-row frame. Partitioned by asset, so parallelism is per-asset
    * like every other indicator. At tick grain (millions of rows per
    * asset-frame) switch to `approx_percentile` over the same frame —
    * mergeable sketch, constant memory (docs/SCALE.md).
    */
  def rollingMedian(prices: DataFrame, window: Int = 30): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    val w = Window.partitionBy("asset").orderBy("ts_utc")
      .rowsBetween(-(window - 1), 0)
    prices.select(col("ts_utc"), col("asset"),
      when(count(col("price")).over(w) >= window,
        round(expr("percentile(price, 0.5)").over(w), 6)).as(s"med$window"))
  }
}
