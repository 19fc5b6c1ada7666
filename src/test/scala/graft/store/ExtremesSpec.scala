package graft.store

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** X203 O(1) MIN/MAX from the manifest — aggregate pushdown into
  * committed per-file stats; files that cannot answer truthfully scan.
  */
class ExtremesSpec extends SparkSpec {
  import spark.implicits._

  private def tmpRoot(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/t"

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("clean table: answer from stats alone — the plan holds NO parquet scan") {
    val root = tmpRoot("graft_ex1")
    Warehouse.writeSnapshot(
      spark.range(0, 5000).toDF("id")
        .withColumn("price", col("id").cast("double") * 1.5 + 10.0)
        .repartition(4), root)
    val got = Warehouse.snapshotExtremes(spark, root, "price")
    assert(!planOf(got).contains("Scan parquet"), planOf(got).take(1200))
    val want = Warehouse.readSnapshot(spark, root)
      .agg(min("price").as("mn"), max("price").as("mx"))
    assert(got.collect().toSeq === want.collect().toSeq)
    // integer column too
    val gid = Warehouse.snapshotExtremes(spark, root, "id")
    assert(!planOf(gid).contains("Scan parquet"))
    assert(gid.as[(Long, Long)].head() === ((0L, 4999L)))
  }

  test("deletion vectors: a dv'd extremum never leaks — only dv'd files scan") {
    val root = tmpRoot("graft_ex2")
    Warehouse.writeSnapshot(
      spark.range(0, 1000).toDF("id").withColumn("v", col("id"))
        .repartitionByRange(4, col("id")), root)
    // kill the recorded maximum: the stats-only answer would say 999
    Warehouse.deleteWhereDv(spark, root, col("id") >= 990L)
    val got = Warehouse.snapshotExtremes(spark, root, "v")
    assert(got.as[(Long, Long)].head() === ((0L, 989L)),
      "a deleted extremum must not leak from stale stats")
    // range-clustered: only the top file carries positions, the other
    // three still answer from stats — the plan scans exactly one leg
    assert(planOf(got).contains("Scan parquet"))
    val full = Warehouse.readSnapshot(spark, root)
      .agg(min("v").as("mn"), max("v").as("mx"))
    assert(got.collect().toSeq === full.collect().toSeq)
  }

  test("renamed column answers through the physical-name stats") {
    val root = tmpRoot("graft_ex3")
    Warehouse.writeSnapshot(
      spark.range(5, 105).toDF("id").withColumn("val", col("id") * 2), root)
    Warehouse.renameSnapshotColumn(spark, root, "val", "amount")
    val got = Warehouse.snapshotExtremes(spark, root, "amount")
    assert(!planOf(got).contains("Scan parquet"))
    assert(got.as[(Long, Long)].head() === ((10L, 208L)))
  }

  test("string and timestamp columns always scan (exactness over cleverness)") {
    val root = tmpRoot("graft_ex4")
    Warehouse.writeSnapshot(
      spark.range(0, 100).toDF("id")
        .withColumn("s", concat(lit("k"), col("id")))
        .withColumn("ts", timestamp_seconds(
          unix_timestamp(lit("2024-01-01 00:00:00")) + col("id"))), root)
    val gs = Warehouse.snapshotExtremes(spark, root, "s")
    assert(planOf(gs).contains("Scan parquet"), "strings must scan")
    assert(gs.as[(String, String)].head() === (("k0", "k99")))
    val gt = Warehouse.snapshotExtremes(spark, root, "ts")
    assert(planOf(gt).contains("Scan parquet"), "timestamps must scan")
    val want = Warehouse.readSnapshot(spark, root)
      .agg(min("ts").as("mn"), max("ts").as("mx")).collect().toSeq
    assert(gt.collect().toSeq === want)
  }

  test("date column answers O(1); appended stat-less... every committed file has stats") {
    val root = tmpRoot("graft_ex5")
    Warehouse.writeSnapshot(
      spark.range(0, 50).toDF("id")
        .withColumn("d", date_add(lit("2024-01-01").cast("date"), col("id").cast("int"))),
      root)
    Warehouse.appendSnapshot(
      Seq((1000L, java.sql.Date.valueOf("2025-06-01"))).toDF("id", "d"), root, 1L)
    val got = Warehouse.snapshotExtremes(spark, root, "d")
    assert(!planOf(got).contains("Scan parquet"),
      "appends record footer stats too — still zero I/O")
    assert(got.as[(java.sql.Date, java.sql.Date)].head().toString ===
      "(2024-01-01,2025-06-01)")
  }

  test("all-NULL measure: scans (indistinguishable from stat-less) and answers NULL") {
    val root = tmpRoot("graft_ex6")
    Warehouse.writeSnapshot(
      spark.range(0, 10).toDF("id")
        .withColumn("v", lit(null).cast("long")), root)
    val got = Warehouse.snapshotExtremes(spark, root, "v")
    val r = got.collect().head
    assert(r.isNullAt(0) && r.isNullAt(1))
  }
}
