package graft.store

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** X180 optimizeSnapshot — small-file bin-packing: only sub-threshold
  * files rewrite, right-sized files carry by reference, the decision
  * reads manifest accounting only.
  */
class OptimizeSpec extends SparkSpec {
  import spark.implicits._

  private def manifestEntries(root: String, v: Long): Seq[String] = {
    val p = org.apache.hadoop.fs.Path.getPathWithoutSchemeAndAuthority(
      new org.apache.hadoop.fs.Path(s"$root/_manifest-v$v"))
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(p.toString)), "UTF-8"))
    (0 until node.get("files").size()).map(node.get("files").get(_).asText())
  }

  test("small append files coalesce; the big base file is carried by reference") {
    val root = java.nio.file.Files.createTempDirectory("graft_opt").toString + "/t"
    // v1: one big file (~800 KB); v2..v5: four tiny append files
    Warehouse.writeSnapshot(
      spark.range(0, 100000).toDF("id").withColumn("p", md5(col("id").cast("string")))
        .coalesce(1), root)
    (1L to 4L).foreach { i =>
      Warehouse.appendSnapshot(
        Seq((1000000L + i, "x")).toDF("id", "p").coalesce(1), root, i)
    }
    val before = Warehouse.readSnapshot(spark, root)
    assert(before.count() === 100004)
    val res = Warehouse.optimizeSnapshot(spark, root, targetFileBytes = 256 << 10)
    assert(res.isDefined)
    val (v6, written) = res.get
    assert(v6 === 6L && written === 1, s"4 tiny files should pack into 1, got $written")
    // the big v1 file is referenced, not rewritten; the packed file is new
    val entries = manifestEntries(root, 6L)
    assert(entries.count(_.startsWith("v=1/")) === 1, s"big file must carry: $entries")
    // same-version files are stored bare by manifest convention
    assert(entries.count(!_.contains("/")) === 1, s"one packed file expected: $entries")
    assert(entries.size === 2)
    // content identical; pinned history intact
    val after = Warehouse.readSnapshot(spark, root)
    assert(after.count() === 100004)
    assert(after.exceptAll(before).isEmpty)
    assert(Warehouse.readSnapshot(spark, root, Some(3L)).count() === 100002)
    // second call: only one small-ish file class left -> no-op
    assert(Warehouse.optimizeSnapshot(spark, root, targetFileBytes = 256 << 10).isEmpty)
    assert(Warehouse.currentSnapshot(spark, root) === 6L)
  }

  test("snapshotFiles metadata table: accounting + shared flags, zero data I/O") {
    val root = java.nio.file.Files.createTempDirectory("graft_files").toString + "/t"
    Warehouse.writeSnapshot(spark.range(0, 100).toDF("id").coalesce(1), root)
    Warehouse.appendSnapshot(Seq(1000L).toDF("id"), root, 1L)
    val files = Warehouse.snapshotFiles(spark, root).collect()
    assert(files.length === 2)
    val byShared = files.map(r => r.getBoolean(3) -> r).toMap
    assert(byShared.contains(true) && byShared.contains(false))
    assert(byShared(true).getString(0).startsWith("v=1/"), "carried entry from v=1")
    assert(files.map(_.getLong(2)).sum === 101, "per-file rows must sum to the table")
    // pinned version: v=1's own file is not shared
    val v1 = Warehouse.snapshotFiles(spark, root, Some(1L)).collect()
    assert(v1.length === 1 && !v1.head.getBoolean(3))
  }

  test("clusterCols: the maintenance tick z-orders the packed files; range reads prune them (r12)") {
    val root = java.nio.file.Files.createTempDirectory("graft_opt3").toString + "/t"
    // v1: one big z-ordered base — must be CARRIED, never rewritten
    val base = spark.range(0, 300000).toDF("i").select(
      (col("i") % 317).as("x"), (col("i") / 317).cast("long").as("y"),
      md5(col("i").cast("string")).as("pay"))
    Warehouse.writeSnapshot(graft.ops.Layout.zorder(base, Seq("x", "y"), 4), root)
    // v2..v9: scattered small appends — a streaming-ingest table's
    // per-tick debris, each file spraying the whole (x, y) space
    (1L to 8L).foreach { i =>
      val a = spark.range(0, 20000).toDF("i").select(
        pmod(hash(col("i") + lit(i * 77)), lit(200)).cast("long").as("x"),
        pmod(hash(col("i") * 31 + lit(i)), lit(200)).cast("long").as("y"),
        lit("z").as("pay"))
      Warehouse.appendSnapshot(a.coalesce(1), root, i)
    }
    val before = Warehouse.readSnapshot(spark, root)
    val beforeCnt = before.count()
    val res = Warehouse.optimizeSnapshot(spark, root,
      targetFileBytes = 128L << 10, clusterCols = Seq("x", "y"))
    assert(res.isDefined)
    val (v10, written) = res.get
    assert(written >= 2, s"need >= 2 packed files to prove pruning, got $written")
    // every big base file carries by reference, untouched
    val entries = manifestEntries(root, v10)
    assert(entries.count(_.startsWith("v=1/")) === manifestEntries(root, 1L).size,
      s"base files must carry: $entries")
    // content identical
    val after = Warehouse.readSnapshot(spark, root)
    assert(after.count() === beforeCnt && after.exceptAll(before).isEmpty)
    // a 2-D box read prunes the FRESHLY PACKED files too: the packed
    // layout is Morton, so its per-file min/max are tight on both dims
    val box = Warehouse.readSnapshotWhere(spark, root,
      Seq(("x", Some(5L), Some(40L)), ("y", Some(5L), Some(40L))))
    val packedTouched = box.inputFiles.count(_.contains(s"v=$v10/"))
    assert(packedTouched < written,
      s"box read must skip some of the $written packed files, touched $packedTouched")
    assert(box.count() ===
      after.filter(col("x").between(5, 40) && col("y").between(5, 40)).count())
  }

  test("all files small -> self-contained compacted version; expiry then reaps history") {
    val root = java.nio.file.Files.createTempDirectory("graft_opt2").toString + "/t"
    Warehouse.writeSnapshot(spark.range(0, 10).toDF("id").repartition(4), root)
    val res = Warehouse.optimizeSnapshot(spark, root, targetFileBytes = 128L << 20)
    assert(res.isDefined && res.get._2 === 1)
    val entries = manifestEntries(root, 2L)
    assert(entries.forall(!_.contains("/")), "self-contained when nothing carried")
    Warehouse.expireSnapshots(spark, root, keepLast = 1)
    assert(Warehouse.readSnapshot(spark, root).count() === 10)
  }
}
