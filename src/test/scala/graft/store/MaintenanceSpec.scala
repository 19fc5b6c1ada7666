package graft.store

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** r13 maintainSnapshot: one tick composes OPTIMIZE → index refresh →
  * analyze ticks → sidecar sweep → retention, each component already
  * incremental. Load-bearing claims: (1) one call on a churned
  * streaming-ingest-shaped table restores small-file count, index
  * coverage, synopsis coverage and retention; (2) a clean table's
  * tick is a full no-op; (3) the clean tick costs ZERO data bytes
  * (poison pin: corrupt every data file, the tick still runs).
  */
class MaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_$tag").toString + "/t"

  private def corruptDataFiles(root: String): Int = {
    val parts = Option(new java.io.File(root).listFiles).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("v="))
      .flatMap(v => Option(v.listFiles).getOrElse(Array.empty))
      .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
    parts.foreach { f =>
      val out = new java.io.FileOutputStream(f)
      out.write("not parquet".getBytes); out.close()
    }
    parts.length
  }

  test("one tick restores layout, index, synopses and retention; clean tick is a zero-I/O no-op") {
    val root = freshRoot("maint")
    // a streaming-ingest-shaped history: one base write + 4 small
    // appends, an index seeded at v1, synopses analyzed at v1 — so by
    // v5 the table has small files, stale index coverage and stale
    // synopsis coverage all at once
    val base = (1 to 200).map(i => (i.toLong, (i % 23).toLong)).toDF("id", "num")
    var v = Warehouse.writeSnapshot(base.coalesce(1), root)
    Warehouse.indexSnapshot(spark, root, "id")
    v = Warehouse.currentSnapshot(spark, root)
    Warehouse.analyzeSnapshot(spark, root, Seq("num"), k = 16)
    Warehouse.analyzeHistogram(spark, root, "num", bins = 5)
    (1 to 4).foreach { j =>
      val more = (200 + j * 100 + 1 to 200 + (j + 1) * 100)
        .map(i => (i.toLong, (i % 23).toLong)).toDF("id", "num")
      v = Warehouse.appendSnapshot(more.coalesce(1), root, v)
    }
    val policy = Warehouse.MaintenancePolicy(
      analyzeColumns = Seq("num"), analyzeK = 16,
      histogramColumns = Seq(("num", 5)),
      retentionMaxAgeMs = Some(0L), retentionKeepLast = 2)
    val r1 = Warehouse.maintainSnapshot(spark, root, policy)
    assert(r1.optimized.nonEmpty, "5 small files must bin-pack")
    assert(r1.indexRefreshed.nonEmpty, "the rewritten files need index coverage")
    assert(r1.analyzed.nonEmpty && r1.histogramsAnalyzed("num/5").nonEmpty,
      "the rewritten files need synopsis coverage")
    assert(r1.sidecarsSwept._1 > 0 && r1.sidecarsSwept._2 > 0,
      "optimize killed the old files' analyze rows")
    assert(r1.expired.nonEmpty, "age-0 retention with keepLast=2 expires the old versions")
    // everything healthy: content intact, stats exact, index-assisted
    // point lookups and zero-scan stats agree with the data
    val total = 200 + 4 * 100
    assert(Warehouse.readSnapshot(spark, root).count() === total)
    assert(Warehouse.snapshotRowCount(spark, root).get === total.toLong)
    val est = Warehouse.ndvSnapshot(spark, root, Seq("num"), k = 16).head().getDouble(1)
    val desc = Warehouse.describeSnapshot(spark, root)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val nFiles = desc("n_files").toInt
    assert(desc("synopsis.num") === s"k=16: $nFiles/$nFiles files covered")
    assert(desc("histogram.num") === s"bins=5: $nFiles/$nFiles files covered")
    // a second tick on the now-clean table is a full no-op
    val r2 = Warehouse.maintainSnapshot(spark, root, policy)
    assert(r2 === Warehouse.MaintenanceReport(None, None, None, None,
      Map("num/5" -> None), (0L, 0L), Seq.empty), r2.toString)
    // ...and it cost zero data bytes: with every data file corrupted
    // the tick still runs clean (manifests + side tables only)
    assert(corruptDataFiles(root) > 0)
    val r3 = Warehouse.maintainSnapshot(spark, root, policy)
    assert(r3.optimized.isEmpty && r3.analyzed.isEmpty && r3.indexRefreshed.isEmpty)
    // the zero-scan stats still answer from the side tables
    assert(Warehouse.ndvSnapshot(spark, root, Seq("num"), k = 16)
      .head().getDouble(1) === est)
  }

  test("dv purge: tick materializes past the threshold, lets small vectors ride below it (r14)") {
    val root = freshRoot("maint_dv")
    val base = (1 to 400).map(i => (i.toLong, (i % 23).toLong)).toDF("id", "num")
    Warehouse.writeSnapshot(base.coalesce(2), root)
    Warehouse.indexSnapshot(spark, root, "id")
    // a dv-erase touching both files: 40 positions, 100% of files
    Warehouse.deleteWhereDv(spark, root, col("id") % 10 === 3L)
    def dvFiles(): Int = {
      val d = Warehouse.describeSnapshot(spark, root)
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      d.get("deletion_vectors.files").map(_.toInt).getOrElse(0)
    }
    assert(dvFiles() > 0, "precondition: the erase recorded dv positions")
    // BELOW both thresholds: the vectors ride, nothing rewrites
    val lax = Warehouse.MaintenancePolicy(optimize = false,
      dvPurgeMinPositions = 1000000L, dvPurgeMinFileFraction = 2.0)
    val r0 = Warehouse.maintainSnapshot(spark, root, lax)
    assert(r0.dvPurged.isEmpty, "below threshold the tick must not rewrite")
    assert(dvFiles() > 0)
    // PAST the file-fraction threshold: the same tick purges AND
    // re-covers the fresh files with the declared index
    val strict = Warehouse.MaintenancePolicy(optimize = false,
      dvPurgeMinPositions = 1000000L, dvPurgeMinFileFraction = 0.5)
    val r1 = Warehouse.maintainSnapshot(spark, root, strict)
    assert(r1.dvPurged.nonEmpty, "past threshold the tick must materialize")
    assert(dvFiles() === 0, "the purged version carries no dv state")
    assert(r1.indexRefreshed.nonEmpty,
      "the purge's fresh files must be index-covered by the SAME tick")
    // content is exactly the surviving rows
    assert(Warehouse.readSnapshot(spark, root).count() === 400 - 40)
    // a second tick is a no-op again (no dv left to purge)
    assert(Warehouse.maintainSnapshot(spark, root, strict).dvPurged.isEmpty)
    // position-count threshold fires independently of the fraction
    Warehouse.deleteWhereDv(spark, root, col("id") === 2L)
    val byCount = Warehouse.MaintenancePolicy(optimize = false,
      dvPurgeMinPositions = 1L, dvPurgeMinFileFraction = 2.0)
    assert(Warehouse.maintainSnapshot(spark, root, byCount).dvPurged.nonEmpty)
    assert(Warehouse.readSnapshot(spark, root).count() === 400 - 41)
  }

  test("a purge tick restores plan-advice coverage: NDV/histogram consults decline on dv, re-certify after (r15)") {
    val root = freshRoot("maint_recert")
    val base = (1 to 400).map(i => (i.toLong, (i % 23).toLong)).toDF("id", "num")
    Warehouse.writeSnapshot(base.coalesce(2), root)
    Warehouse.analyzeSnapshot(spark, root, Seq("num"), k = 64)
    Warehouse.analyzeHistogram(spark, root, "num", bins = 10)
    assert(Warehouse.recordedNdv(spark, root, "num").nonEmpty)
    assert(Warehouse.estimateRows(spark, root, "num", 0.0, 10.0, bins = 10).nonEmpty)
    assert(Warehouse.recordedMaxBinRows(spark, root, "num").nonEmpty)
    // one dv'd file poisons every planning consult: all decline (a
    // planner consult never scans, so it cannot subtract dv rows)
    Warehouse.deleteWhereDv(spark, root, col("id") % 10 === 3L)
    assert(Warehouse.recordedNdv(spark, root, "num").isEmpty)
    assert(Warehouse.estimateRows(spark, root, "num", 0.0, 10.0, bins = 10).isEmpty)
    assert(Warehouse.recordedMaxBinRows(spark, root, "num").isEmpty)
    // ONE maintenance tick: purge + re-analyze — the same tick that
    // rewrites the dv'd files also re-covers the replacements, so
    // plan-advice coverage comes back without a second pass
    val policy = Warehouse.MaintenancePolicy(optimize = false,
      analyzeColumns = Seq("num"), analyzeK = 64,
      histogramColumns = Seq(("num", 10)),
      dvPurgeMinPositions = 1L, dvPurgeMinFileFraction = 2.0)
    val r = Warehouse.maintainSnapshot(spark, root, policy)
    assert(r.dvPurged.nonEmpty)
    assert(Warehouse.recordedNdv(spark, root, "num").nonEmpty,
      "the purge-and-analyze tick must restore NDV plan coverage")
    assert(Warehouse.estimateRows(spark, root, "num", 0.0, 10.0, bins = 10).nonEmpty,
      "the tick must restore histogram plan coverage")
    assert(Warehouse.recordedMaxBinRows(spark, root, "num").nonEmpty,
      "the tick must restore the hub-veto signal")
  }

  test("maintainSnapshot without an index or retention policy skips both") {
    val root = freshRoot("maint_min")
    Warehouse.writeSnapshot((1 to 50).map(i => (i.toLong, i.toLong)).toDF("id", "num"), root)
    val r = Warehouse.maintainSnapshot(spark, root,
      Warehouse.MaintenancePolicy(analyzeColumns = Seq("num"), analyzeK = 16))
    assert(r.indexRefreshed.isEmpty, "no index declared -> refresh skipped, not errored")
    assert(r.expired.isEmpty, "no age policy -> retention untouched")
    assert(r.analyzed.nonEmpty)
    assert(Warehouse.snapshots(spark, root).size >= 1)
  }
}
