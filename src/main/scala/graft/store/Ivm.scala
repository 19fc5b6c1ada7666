package graft.store

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of materialized COUNT/SUM aggregates from a
  * change-data feed — the self-maintainable-views algebra (Gupta &
  * Mumick's classic IVM result) over [[Warehouse]]'s CDF vocabulary:
  * a `GROUP BY` rollup of a 100 TB table stays current with work
  * proportional to the FEED, never a rescan.
  *
  * Each feed row carries a sign: `insert`/`update` (post-image) +1,
  * `delete`/`update_preimage` −1. The per-group delta is one
  * hash-aggregate of the feed; merging it into the materialized state
  * is one keyed outer join against a batch-sized delta. COUNT and SUM
  * are self-maintainable under this algebra; MIN/MAX are NOT (a
  * deleted extremum needs a rescan of its group) and are deliberately
  * not offered. Updates REQUIRE preimage rows in the feed (recorded by
  * `changeFeed = true` writes since r11, or `diffFrames(...,
  * preImages = true)`) — a post-only feed cannot say what an update
  * replaced, and maintenance refuses it loudly rather than drifting.
  *
  * A group-key–changing update maintains both groups naturally: the
  * preimage subtracts from the old group, the post-image adds to the
  * new. Groups whose maintained count reaches 0 are dropped (the
  * recompute would not have the group). NULL measure values contribute
  * 0 to sums, matching SQL `sum`'s null-skipping — except that a group
  * with ONLY null measures reads 0 here where a recompute reads NULL
  * (document-level caveat; count is always exact).
  */
object Ivm {

  /** Apply one feed to a materialized aggregate.
    *
    * @param agg      the materialized state: `keys ++ countCol ++ sums.keys`
    * @param feed     CDF rows: table columns + `_change_type`
    * @param keys     the GROUP BY columns (present in both inputs)
    * @param sums     aggregate column in `agg` -> source measure column
    *                 in the feed (sum maintenance); types follow `agg`'s
    * @param countCol the COUNT(*) column in `agg` (count maintenance,
    *                 and the group-liveness signal)
    */
  def maintainAggregate(agg: DataFrame, feed: DataFrame, keys: Seq[String],
                        sums: Map[String, String] = Map.empty,
                        countCol: String = "n"): DataFrame = {
    require(keys.nonEmpty, "maintainAggregate needs group-by keys")
    require(agg.columns.contains(countCol),
      s"maintainAggregate: aggregate state lacks count column '$countCol'")
    sums.keys.foreach(c => require(agg.columns.contains(c),
      s"maintainAggregate: aggregate state lacks sum column '$c'"))
    val aggTypes = agg.schema.fields.map(f => f.name -> f.dataType).toMap
    val sign = when(col("_change_type").isin("insert", "update"), lit(1L))
      .when(col("_change_type").isin("delete", "update_preimage"), lit(-1L))
    // refuse a post-only update feed BEFORE producing drifted state: an
    // update without its preimage would count (and sum) the post row as
    // if it were an insert. One cheap driver-side probe on the
    // batch-sized feed.
    val Array(ups, pres) = feed.agg(
      sum(when(col("_change_type") === "update", 1L).otherwise(0L)),
      sum(when(col("_change_type") === "update_preimage", 1L).otherwise(0L)))
      .collect().head.toSeq.map(v => Option(v).fold(0L)(_.asInstanceOf[Long])).toArray
    require(ups == pres,
      s"maintainAggregate: feed has $ups update rows but $pres preimages — " +
        "maintenance needs preimage-recording feeds (diffFrames(..., preImages = true))")
    val deltaAggs =
      sum(col("__sign")).as("__dn") +:
        sums.toSeq.map { case (aggCol, src) =>
          sum(col("__sign").cast(aggTypes(aggCol))
            * coalesce(col(src).cast(aggTypes(aggCol)),
              lit(0).cast(aggTypes(aggCol)))).as(s"__d_$aggCol")
        }
    val delta = feed.withColumn("__sign", sign)
      .filter(col("__sign").isNotNull)
      .groupBy(keys.map(col): _*)
      .agg(deltaAggs.head, deltaAggs.tail: _*)
    val zero = lit(0L).cast(aggTypes(countCol))
    val merged = agg.join(delta, keys, "full_outer")
      .select(keys.map(col) ++ Seq(
        (coalesce(col(countCol), zero) + coalesce(col("__dn"), lit(0L)))
          .cast(aggTypes(countCol)).as(countCol)) ++
        sums.keys.toSeq.map { aggCol =>
          (coalesce(col(aggCol), lit(0).cast(aggTypes(aggCol)))
            + coalesce(col(s"__d_$aggCol"), lit(0).cast(aggTypes(aggCol))))
            .cast(aggTypes(aggCol)).as(aggCol)
        }: _*)
    merged.filter(col(countCol) > 0)
  }

  /** [[maintainAggregate]] driven straight from the warehouse: fold the
    * PERSISTED feeds of versions `fromVersion..toVersion` (inclusive)
    * into `agg` in one pass — the feeds union into a single batch and
    * signs cancel telescopically, so catching a replica's rollup up
    * across N commits costs ONE delta aggregate + ONE merge join, not
    * N. Every version in the range must have a recorded feed
    * ([[Warehouse.readChangeFeed]] enforces the gap rule).
    */
  def maintainFromWarehouse(agg: DataFrame, path: String, keys: Seq[String],
                            fromVersion: Long, toVersion: Long,
                            sums: Map[String, String] = Map.empty,
                            countCol: String = "n"): DataFrame = {
    val spark = agg.sparkSession
    val feed = Warehouse.readChangeFeed(spark, path, fromVersion, toVersion)
      .drop("_commit_version")
    maintainAggregate(agg, feed, keys, sums, countCol)
  }
}
