package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality assertions — the reference's `quality_checks` task
  * (dag_btc_daily.py:373-443; README.md:101-109) as composable Dataset
  * checks. A failed check throws, like the reference's raised
  * exceptions failing the Airflow task.
  *
  * Thresholds come straight from the reference: ≥20 hourly rows per
  * day (dag:409, ≈83% completeness of 24), non-null OHLC for the day
  * (dag:421-424), ma30/vol30 non-null once ≥30 days of history
  * (dag:426-435).
  */
object Checks {
  final case class CheckFailure(msg: String) extends RuntimeException(msg)

  private def fail(msg: String): Nothing = throw CheckFailure(msg)

  /** dag:398-411 — per-(date, asset) row-count floor over raw prices.
    * Returns the offending groups (empty = pass); one aggregate pass,
    * no per-day loop.
    */
  def underfilledDays(prices: DataFrame, minRows: Long = 20): DataFrame =
    prices.groupBy(to_date(col("ts_utc")).as("date"), col("asset"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") < minRows)

  def requireDailyCompleteness(prices: DataFrame, minRows: Long = 20): Unit = {
    val bad = underfilledDays(prices, minRows)
    if (!bad.isEmpty) fail(s"days with < $minRows rows: ${bad.limit(5).collect().mkString(", ")}")
  }

  /** dag:413-424 — the day's row exists with non-null OHLC. */
  def requireOhlcPresent(metrics: DataFrame, date: String, asset: String): Unit = {
    val row = metrics.filter(col("date") === lit(date) && col("asset") === lit(asset))
    if (row.isEmpty) fail(s"daily_metrics missing ($date, $asset)")
    val nulls = row.filter(Seq("open", "high", "low", "close").map(col(_).isNull).reduce(_ || _))
    if (!nulls.isEmpty) fail(s"NULL OHLC for ($date, $asset)")
  }

  /** dag:426-435 — once an asset has ≥30 days of history, its latest
    * row must have non-null ma30/vol30... i.e. no row past the warm-up
    * horizon may have a NULL 30-row indicator. Vectorized over all
    * assets: row_number per asset ≥ 31 (vol30 lags one row, SURVEY.md
    * §2.5 W4) with NULL ma30/vol30 is a violation.
    */
  def indicatorGaps(metrics: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("asset").orderBy("date")
    metrics
      .withColumn("_rn", row_number().over(w))
      .filter((col("_rn") >= 30 && col("ma30").isNull) ||
              (col("_rn") >= 31 && col("vol30").isNull))
      .drop("_rn")
  }

  def requireIndicatorsWarm(metrics: DataFrame): Unit = {
    val bad = indicatorGaps(metrics)
    if (!bad.isEmpty) fail(s"indicator gaps past warm-up: ${bad.limit(5).collect().mkString(", ")}")
  }

  /** Expectation-suite validation with quarantine — the dead-letter
    * pattern the throwing checks above can't express: instead of
    * failing the whole batch on the first bad row, ANNOTATE each row
    * with the first rule it fails (`_quarantine_reason`, NULL = valid)
    * so the good rows flow on and the bad ones land in a quarantine
    * table with their reason attached. Rules are ordered (name,
    * predicate) pairs; a predicate evaluating NULL counts as a FAILURE
    * — validation must be closed-world (`value >= 0` on a NULL value
    * is not a pass), which is why the rule is wrapped
    * `!coalesce(pred, false)`, not `!pred`.
    *
    * Scale: the whole suite is one chained CASE in a single projection
    * — zero shuffles, codegen'd, rule count only widens the
    * expression. The split form ([[partitionQuarantine]]) shares the
    * one annotated plan between both halves.
    */
  def annotateQuarantine(df: DataFrame,
      rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "annotateQuarantine needs at least one rule")
    val reason = rules.foldRight(lit(null).cast("string")) {
      case ((name, pred), els) => when(!coalesce(pred, lit(false)), lit(name)).otherwise(els)
    }
    df.withColumn("_quarantine_reason", reason)
  }

  /** (valid rows, unchanged schema; quarantined rows + reason). */
  def partitionQuarantine(df: DataFrame,
      rules: Seq[(String, Column)]): (DataFrame, DataFrame) = {
    val annotated = annotateQuarantine(df, rules)
    (annotated.filter(col("_quarantine_reason").isNull).drop("_quarantine_reason"),
     annotated.filter(col("_quarantine_reason").isNotNull))
  }

  /** dag:394-395, 439-441 (S12) — file artifact exists and is non-empty. */
  def requireFileNonEmpty(spark: org.apache.spark.sql.SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) fail(s"missing artifact: $path")
    val status = fs.getFileStatus(p)
    val size = if (status.isDirectory) fs.getContentSummary(p).getLength else status.getLen
    if (size <= 0) fail(s"empty artifact: $path")
  }
}
