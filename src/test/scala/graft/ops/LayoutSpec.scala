package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  /** per-file (min, max) stats for a column, as the scan pruner sees them */
  private def fileRanges(path: String, c: String): Array[(Double, Double)] =
    spark.read.parquet(path)
      .groupBy(input_file_name())
      .agg(min(col(c).cast("double")).as("lo"), max(col(c).cast("double")).as("hi"))
      .select("lo", "hi").as[(Double, Double)].collect()

  private def filesTouched(path: String, c: String, lo: Double, hi: Double): Int =
    fileRanges(path, c).count { case (flo, fhi) => fhi >= lo && flo <= hi }

  test("zorder: footer min/max prune on EVERY clustered dim; data identical") {
    // a 100x100 grid — x and y are independent, so a single-column sort
    // can only serve one of them
    val df = spark.range(10000)
      .select((col("id") % 100).cast("long").as("x"),
        (col("id") / 100).cast("long").as("y"))
    val base = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    val zDir = s"$base/z"; val xDir = s"$base/x"
    Layout.zorder(df, Seq("x", "y"), outPartitions = 16).write.parquet(zDir)
    // strawman: sorted by x only, same file count
    df.repartitionByRange(16, col("x")).sortWithinPartitions("x").write.parquet(xDir)
    // same rows either way
    assert(spark.read.parquet(zDir).as[(Long, Long)].collect().sorted.toSeq ===
      df.as[(Long, Long)].collect().sorted.toSeq)
    // a 10-wide slice on y: the x-sorted layout can't skip anything,
    // the z-order tiles the plane so most files' y-ranges miss it
    // ideal tiling is 4 files; range-partition boundary sampling leaves
    // some tiles straddling, so assert "most files skipped", not ideal
    val zTouchY = filesTouched(zDir, "y", 40, 49)
    val xTouchY = filesTouched(xDir, "y", 40, 49)
    assert(xTouchY === 16, s"x-sorted layout should be unprunable on y, got $xTouchY")
    assert(zTouchY <= 10, s"z-order should prune files on y, touched $zTouchY/16")
    // and x stays prunable too (the point: BOTH dims skip)
    val zTouchX = filesTouched(zDir, "x", 40, 49)
    assert(zTouchX <= 10, s"z-order should prune files on x, touched $zTouchX/16")
    // narrower probes skip proportionally more
    assert(filesTouched(zDir, "y", 40, 42) <= 6)
    assert(filesTouched(zDir, "x", 40, 42) <= 6)
  }
}
