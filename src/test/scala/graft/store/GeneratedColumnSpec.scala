package graft.store

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** X205 generated columns — fill on write when absent, fused
  * validation when supplied, data skipping on the derived column.
  */
class GeneratedColumnSpec extends SparkSpec {
  import spark.implicits._

  private def tmpRoot(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/t"

  test("writes fill the derived column; appends without it fill through the schema gate") {
    val root = tmpRoot("graft_gc1")
    Warehouse.setGeneratedColumn(spark, root, "day", "CAST(ts / 86400 AS BIGINT)")
    Warehouse.writeSnapshot(
      spark.range(0, 100).toDF("id").withColumn("ts", col("id") * 10000L), root)
    val got = Warehouse.readSnapshot(spark, root)
    assert(got.columns.toSeq === Seq("id", "ts", "day"))
    assert(got.where(col("day") =!= (col("ts") / 86400L).cast("long")).count() === 0)
    // append supplies only the business columns — the table derives day
    Warehouse.appendSnapshot(Seq((1000L, 864000L)).toDF("id", "ts"), root, 1L)
    val row = Warehouse.readSnapshot(spark, root).where(col("id") === 1000L)
      .select("day").as[Long].head()
    assert(row === 10L)
  }

  test("a supplied divergent value aborts; a supplied correct value passes") {
    val root = tmpRoot("graft_gc2")
    Warehouse.setGeneratedColumn(spark, root, "day", "CAST(ts / 86400 AS BIGINT)")
    Warehouse.writeSnapshot(
      spark.range(0, 10).toDF("id").withColumn("ts", col("id") * 86400L), root)
    Warehouse.appendSnapshot(
      Seq((100L, 86400L, 1L)).toDF("id", "ts", "day"), root, 1L)
    val vBefore = Warehouse.currentSnapshot(spark, root)
    intercept[Exception] {
      Warehouse.appendSnapshot(
        Seq((101L, 86400L, 99L)).toDF("id", "ts", "day"), root, vBefore)
    }
    assert(Warehouse.currentSnapshot(spark, root) === vBefore)
  }

  test("row-level writes re-derive: a SET on the source recomputes the derived column") {
    val root = tmpRoot("graft_gc3")
    Warehouse.setGeneratedColumn(spark, root, "dbl", "v * 2")
    Warehouse.writeSnapshot(
      spark.range(0, 50).toDF("id").withColumn("v", col("id")), root)
    // SET the source only — the rule recomputes (Delta UPDATE behavior)
    Warehouse.updateWhere(spark, root, col("id") === 4L, Map("v" -> lit(100L)))
    assert(Warehouse.readSnapshot(spark, root).where(col("id") === 4L)
      .select("dbl").as[Long].head() === 200L)
    // an explicit divergent SET of the derived column is overwritten
    // by its definition — the rule wins on the derived column
    Warehouse.updateWhereDv(spark, root, col("id") === 5L,
      Map("v" -> lit(7L), "dbl" -> lit(999L)))
    assert(Warehouse.readSnapshot(spark, root).where(col("id") === 5L)
      .select("dbl").as[Long].head() === 14L)
    // untouched rows keep their (already valid) derivation
    assert(Warehouse.readSnapshot(spark, root)
      .where(col("dbl") =!= col("v") * 2).count() === 0)
  }

  test("replaceWhere fills the derived column like appends do") {
    val root = tmpRoot("graft_gc3b")
    Warehouse.setGeneratedColumn(spark, root, "dbl", "v * 2")
    Warehouse.writeSnapshot(
      spark.range(0, 20).toDF("id").withColumn("v", col("id")), root)
    Warehouse.replaceWhere(spark, root, col("id") < 5L,
      Seq((100L, 3L)).toDF("id", "v").filter(col("id") < 5L).unionByName(
        Seq((1L, 50L)).toDF("id", "v")))
    val got = Warehouse.readSnapshot(spark, root)
    assert(got.where(col("id") === 1L).select("dbl").as[Long].head() === 100L)
    assert(got.where(col("dbl") =!= col("v") * 2).count() === 0)
  }

  test("stats pruning on the derived column: the writer never computes it, reads skip by it") {
    val root = tmpRoot("graft_gc4")
    Warehouse.setGeneratedColumn(spark, root, "day", "CAST(ts / 86400 AS BIGINT)")
    Warehouse.writeSnapshot(
      spark.range(0, 2000).toDF("id")
        .withColumn("ts", col("id") * 1000L)
        .repartitionByRange(8, col("id")), root)
    val pruned = Warehouse.readSnapshotRange(spark, root, "day", Some(0L), Some(0L))
    val full = Warehouse.readSnapshot(spark, root).where(col("day") === 0L)
    assert(pruned.exceptAll(full).isEmpty && full.exceptAll(pruned).isEmpty)
    // an out-of-domain day prunes every file
    val none = Warehouse.readSnapshotRange(spark, root, "day", Some(1000L), Some(2000L))
    assert(!none.queryExecution.executedPlan.toString.contains("Scan parquet"))
  }

  test("refusals and lifecycle: non-deterministic expr, drop lifts, unreadable file gates") {
    val root = tmpRoot("graft_gc5")
    intercept[IllegalArgumentException] {
      Warehouse.setGeneratedColumn(spark, root, "r", "rand()")
    }
    Warehouse.setGeneratedColumn(spark, root, "neg", "0 - v")
    Warehouse.writeSnapshot(spark.range(0, 5).toDF("id").withColumn("v", col("id")), root)
    assert(Warehouse.dropGeneratedColumn(spark, root, "neg"))
    assert(!Warehouse.dropGeneratedColumn(spark, root, "neg"))
    // with the rule dropped, a divergent value is just a value
    Warehouse.appendSnapshot(
      Seq((10L, 1L, 999L)).toDF("id", "v", "neg"), root, 1L)
    assert(Warehouse.readSnapshot(spark, root).count() === 6)
    // corrupt rules file fails writes loudly
    java.nio.file.Files.write(java.nio.file.Paths.get(root, "_generated"),
      "not json".getBytes)
    intercept[java.io.IOException] {
      Warehouse.appendSnapshot(Seq((11L, 1L, -1L)).toDF("id", "v", "neg"), root, 2L)
    }
  }
}
