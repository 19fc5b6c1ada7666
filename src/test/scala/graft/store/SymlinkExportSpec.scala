package graft.store

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** X206 symlink-manifest export — the committed snapshot as a plain
  * file list any parquet-only engine can consume.
  */
class SymlinkExportSpec extends SparkSpec {
  import spark.implicits._

  private def tmpRoot(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/t"

  private def linesOf(mf: String): Seq[String] = {
    val p = org.apache.hadoop.fs.Path.getPathWithoutSchemeAndAuthority(
      new org.apache.hadoop.fs.Path(mf))
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(p.toString)), "UTF-8").split("\n").toSeq.filter(_.nonEmpty)
  }

  test("the listed files ARE the snapshot: multi-version table, carried refs included") {
    val root = tmpRoot("graft_sx1")
    Warehouse.writeSnapshot(
      spark.range(0, 100).toDF("id").withColumn("v", col("id")).repartition(3), root)
    Warehouse.appendSnapshot(
      spark.range(100, 150).toDF("id").withColumn("v", col("id")), root, 1L)
    val mf = Warehouse.exportSymlinkManifest(spark, root)
    val consumer = spark.read.parquet(linesOf(mf): _*)
    val want = Warehouse.readSnapshot(spark, root)
    assert(consumer.exceptAll(want).isEmpty && want.exceptAll(consumer).isEmpty)
    // a pinned old-version export sees only v=1's rows
    val mf1 = Warehouse.exportSymlinkManifest(spark, root, Some(1L))
    assert(spark.read.parquet(linesOf(mf1): _*).count() === 100)
  }

  test("mapped table: the sidecar carries the alias the consumer needs") {
    val root = tmpRoot("graft_sx2")
    Warehouse.writeSnapshot(
      spark.range(0, 50).toDF("id").withColumn("val", col("id") * 2), root)
    Warehouse.renameSnapshotColumn(spark, root, "val", "amount")
    val mf = Warehouse.exportSymlinkManifest(spark, root)
    val sideP = org.apache.hadoop.fs.Path.getPathWithoutSchemeAndAuthority(
      new org.apache.hadoop.fs.Path(mf.replace("manifest.txt", "schema.json")))
    val side = new com.fasterxml.jackson.databind.ObjectMapper().readTree(
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(sideP.toString)), "UTF-8"))
    assert(side.get("columnMap").get("amount").asText === "val")
    // consumer aliases per the sidecar and matches the logical read
    val consumer = spark.read.parquet(linesOf(mf): _*)
      .select(col("id"), col("val").as("amount"))
    val want = Warehouse.readSnapshot(spark, root)
    assert(consumer.exceptAll(want).isEmpty && want.exceptAll(consumer).isEmpty)
  }

  test("live deletion vectors refuse; after materialization the export works") {
    val root = tmpRoot("graft_sx3")
    Warehouse.writeSnapshot(
      spark.range(0, 100).toDF("id").withColumn("v", col("id")), root)
    Warehouse.deleteWhereDv(spark, root, col("id") < 10L)
    intercept[IllegalArgumentException] {
      Warehouse.exportSymlinkManifest(spark, root)
    }
    Warehouse.materializeDeletes(spark, root)
    val mf = Warehouse.exportSymlinkManifest(spark, root)
    assert(spark.read.parquet(linesOf(mf): _*).count() === 90)
  }
}
