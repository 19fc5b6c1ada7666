package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval joins, bucketed so they run as EQUI-joins.
  *
  * Spark plans `p BETWEEN s AND e` join conditions as
  * BroadcastNestedLoopJoin (build side must fit in memory, probe cost
  * O(points × intervals)) — at 100 TB neither holds. The standard
  * scalable shape is bucketing: quantize the value axis into
  * fixed-width buckets, explode each interval to the buckets it
  * overlaps, tag each point with its single containing bucket, then
  * equi-join on the bucket id and re-check the exact predicate. The
  * join becomes a plain shuffled (or broadcast, if the exploded
  * interval side is small) hash join: cost O(points + intervals ×
  * buckets_per_interval + true_matches), and every (point, interval)
  * pair meets EXACTLY once — in the point's own bucket — so no
  * dedup pass is needed afterwards.
  *
  * Pick `bucket` on the order of the typical interval length: much
  * smaller multiplies the interval-side explode; much larger makes
  * each bucket pair many non-matching points with many non-matching
  * intervals (the exact filter then discards them after the shuffle).
  * Both failure modes are linear-factor waste, not correctness bugs.
  * Interval replication is bounded by `maxBucketsPerInterval`
  * (runtime-checked inside the row, no extra pass): an interval
  * spanning more buckets than that fails the job loudly rather than
  * silently exploding a hot row into millions of bucket rows.
  */
object IntervalJoin {

  /** Inner-join `points` to every interval containing them:
    * `s <= p <= e` (inclusive both ends, mirroring SQL BETWEEN).
    * `pCol` on the points side and `sCol`/`eCol` on the intervals side
    * must be numeric (callers with timestamps pass epoch seconds/µs).
    * Output carries all columns of both inputs.
    */
  def pointInInterval(points: DataFrame, pCol: String,
                      intervals: DataFrame, sCol: String, eCol: String,
                      bucket: Long,
                      maxBucketsPerInterval: Int = 10000): DataFrame = {
    require(bucket > 0, s"bucket width must be positive, got $bucket")
    require(maxBucketsPerInterval > 0,
      s"maxBucketsPerInterval must be positive, got $maxBucketsPerInterval")
    val pb = points.withColumn("__b", floor(col(pCol) / bucket).cast("long"))
    val lo = floor(col(sCol) / bucket).cast("long")
    val hi = floor(col(eCol) / bucket).cast("long")
    val guarded = when(hi - lo < lit(maxBucketsPerInterval.toLong), sequence(lo, hi))
      .otherwise(raise_error(format_string(
        s"interval spans more than $maxBucketsPerInterval buckets of width " +
          s"$bucket: [%s, %s]; raise the bucket width", col(sCol), col(eCol))))
    val ib = intervals.withColumn("__b", explode(guarded))
    pb.join(ib, Seq("__b"))
      .filter(col(pCol).between(col(sCol), col(eCol)))
      .drop("__b")
  }
}
