package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  test("pointInInterval matches the naive cross-join filter across bucket widths") {
    val points = Seq((1L, 5L), (2L, 17L), (3L, 30L), (4L, 30L), (5L, 99L), (6L, -3L))
      .toDF("pid", "p")
    val intervals = Seq((10L, 0L, 10L), (11L, 10L, 30L), (12L, 25L, 26L), (13L, -5L, 0L))
      .toDF("iid", "s", "e")
    val naive = points.crossJoin(intervals)
      .filter(col("p").between(col("s"), col("e")))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    // a (point, interval) pair must meet exactly once regardless of how
    // the bucket width slices the intervals — and boundary points
    // (p == s, p == e) are kept (inclusive BETWEEN)
    for (bucket <- Seq(1L, 3L, 7L, 100L)) {
      val got = IntervalJoin.pointInInterval(points, "p", intervals, "s", "e", bucket)
        .select("pid", "iid").as[(Long, Long)].collect()
      assert(got.length === got.toSet.size, s"duplicate pairs at bucket=$bucket")
      assert(got.toSet === naive, s"pair set mismatch at bucket=$bucket")
    }
  }

  test("an interval spanning more than maxBucketsPerInterval buckets fails loudly") {
    val points = Seq((1L, 5L)).toDF("pid", "p")
    val wide = Seq((10L, 0L, 1000L)).toDF("iid", "s", "e")
    val ex = intercept[Exception] {
      IntervalJoin.pointInInterval(points, "p", wide, "s", "e",
        bucket = 1L, maxBucketsPerInterval = 100).collect()
    }
    assert(ex.getMessage.contains("raise the bucket width") ||
      Option(ex.getCause).exists(_.getMessage.contains("raise the bucket width")))
  }
}
