package graft.store

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** X231 per-file column synopses: ANALYZE + zero-scan NDV.
  * The load-bearing claims: (1) the merged estimate is bit-identical
  * to kmvDistinct over the whole table, covered or not; (2) with full
  * coverage the answer touches ZERO data bytes (poison pin: corrupt
  * every data file, the estimate still answers); (3) analyze is
  * incremental — covered files are never rescanned (poison pin again);
  * (4) synopses key on physical names, so a RENAME costs nothing;
  * (5) dv-carrying files are never recorded and live-scan
  * dv-subtracted, so a dv table's answer is exact, never refused,
  * and dv-free files keep their zero-scan (r13).
  */
class AnalyzeSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_$tag").toString + "/t"

  private def table(n: Int, mod: Int): org.apache.spark.sql.DataFrame =
    (1 to n).map(i => (i.toLong, (i % mod).toLong, s"s${i % 7}"))
      .toDF("id", "num", "cat")

  /** The X223 estimator over the full table — the equality oracle. */
  private def kmvOf(df: org.apache.spark.sql.DataFrame, c: String, k: Int): Double =
    graft.ext.Sketches.kmvDistinct(df.withColumn("g", lit(1)), Seq("g"), c, k)
      .head().getDouble(1)

  private def corruptDataFiles(root: String): Int = {
    val dir = new java.io.File(root)
    val parts = Option(dir.listFiles).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("v="))
      .flatMap(v => Option(v.listFiles).getOrElse(Array.empty))
      .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
    parts.foreach { f =>
      val out = new java.io.FileOutputStream(f)
      out.write("not parquet".getBytes); out.close()
    }
    parts.length
  }

  test("ndvSnapshot == kmvDistinct over the table, covered, uncovered and mixed") {
    val root = freshRoot("ndv_eq")
    val a = table(600, 97).filter($"id" % 3 =!= 0)
    val b = table(600, 97).filter($"id" % 3 === 0)
    val v1 = Warehouse.writeSnapshot(a.repartition(3), root)
    // fully uncovered: no analyze ran — live scan path, still exact
    val full = table(600, 97)
    def estimates(): Map[String, Double] =
      Warehouse.ndvSnapshot(spark, root, Seq("num", "cat"), k = 32)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val uncovered = estimates()
    assert(uncovered("num") === kmvOf(a, "num", 32))
    assert(uncovered("cat") === kmvOf(a, "cat", 32))
    assert(uncovered("cat") === 7.0, "below k the estimate is the exact count")
    // analyze, append uncovered files: mixed recorded + live
    assert(Warehouse.analyzeSnapshot(spark, root, Seq("num", "cat"), k = 32).nonEmpty)
    Warehouse.appendSnapshot(b.repartition(2), root, v1)
    val mixed = estimates()
    assert(mixed("num") === kmvOf(full, "num", 32))
    assert(mixed("cat") === kmvOf(full, "cat", 32))
    // covering analyze (only the 2 new files), then full coverage -> None
    assert(Warehouse.analyzeSnapshot(spark, root, Seq("num", "cat"), k = 32).nonEmpty)
    assert(Warehouse.analyzeSnapshot(spark, root, Seq("num", "cat"), k = 32).isEmpty,
      "complete coverage must not commit")
    assert(estimates() === mixed)
    // a different k is a different synopsis family: uncovered -> live
    // scan, exact under ITS estimator
    val k8 = Warehouse.ndvSnapshot(spark, root, Seq("num"), k = 8)
      .head().getDouble(1)
    assert(k8 === kmvOf(full, "num", 8))
    // time travel: v1's estimate answers from the same per-file rows
    // and equals kmv over the OLD content — synopses key on files
    val old = Warehouse.ndvSnapshot(spark, root, Seq("num"), k = 32, version = Some(v1))
      .head().getDouble(1)
    assert(old === kmvOf(a, "num", 32))
    // describe surfaces the coverage per column
    val desc = Warehouse.describeSnapshot(spark, root)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(desc("synopsis.num") === "k=32: 5/5 files covered", desc.toString)
    assert(desc("synopsis.cat") === "k=32: 5/5 files covered")
  }

  test("full coverage answers with ZERO data reads (poison pin) and survives a rename") {
    val root = freshRoot("ndv_pin")
    val df = table(400, 53)
    Warehouse.writeSnapshot(df.repartition(4), root)
    assert(Warehouse.analyzeSnapshot(spark, root, Seq("num"), k = 32).nonEmpty)
    val before = Warehouse.ndvSnapshot(spark, root, Seq("num"), k = 32).head().getDouble(1)
    assert(before === kmvOf(df, "num", 32))
    assert(corruptDataFiles(root) === 4)
    // data files are garbage; the synopsis side table still answers
    val after = Warehouse.ndvSnapshot(spark, root, Seq("num"), k = 32).head().getDouble(1)
    assert(after === before, "full coverage must not open data files")
    // rename: synopses key on the physical name — the logical rename
    // is free, no re-analyze, no data read (files are still garbage)
    Warehouse.renameSnapshotColumn(spark, root, "num", "num_renamed")
    val renamed = Warehouse.ndvSnapshot(spark, root, Seq("num_renamed"), k = 32)
      .collect()
    assert(renamed.length === 1 && renamed.head.getString(0) === "num_renamed")
    assert(renamed.head.getDouble(1) === before)
    // ...and the coverage REPORT follows the rename (r14): the family
    // must not strand under the dead logical label — describeSnapshot
    // labels coverage by the CURRENT logical name
    val desc = Warehouse.describeSnapshot(spark, root)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(desc.contains("synopsis.num_renamed"),
      s"coverage must re-label to the live name: ${desc.keys.filter(_.startsWith("synopsis")).mkString(", ")}")
    assert(!desc.contains("synopsis.num"),
      "the dead logical label must not appear")
    assert(desc("synopsis.num_renamed") === "k=32: 4/4 files covered")
  }

  test("incremental analyze never rescans covered files (poison pin on the old files)") {
    val root = freshRoot("ndv_incr")
    val a = table(300, 41).filter($"id" <= 200)
    val b = table(300, 41).filter($"id" > 200)
    val v1 = Warehouse.writeSnapshot(a.repartition(2), root)
    assert(Warehouse.analyzeSnapshot(spark, root, Seq("num"), k = 32).nonEmpty)
    // poison the covered files, then append clean ones: the second
    // analyze must succeed (it may only read the NEW files) and the
    // estimate must reflect a's ORIGINAL content via its synopses
    assert(corruptDataFiles(root) === 2)
    Warehouse.appendSnapshot(b.repartition(1), root, v1)
    assert(Warehouse.analyzeSnapshot(spark, root, Seq("num"), k = 32).nonEmpty)
    val est = Warehouse.ndvSnapshot(spark, root, Seq("num"), k = 32).head().getDouble(1)
    assert(est === kmvOf(table(300, 41), "num", 32))
  }

  test("histogramSnapshot: exact merged counts, pinned edges clamp later appends (X234)") {
    val root = freshRoot("hist")
    val a = (1 to 300).map(i => (i.toLong, (i % 100).toDouble)).toDF("id", "v")
    val v1 = Warehouse.writeSnapshot(a.repartition(3), root)
    assert(Warehouse.analyzeHistogram(spark, root, "v", bins = 10).nonEmpty)
    // append values EXCEEDING the pinned range: they must clamp into
    // the end bin, not shift the edges
    val b = (301 to 400).map(i => (i.toLong, 150.0 + i)).toDF("id", "v")
    Warehouse.appendSnapshot(b.repartition(1), root, v1)
    val h = Warehouse.histogramSnapshot(spark, root, "v", bins = 10)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getLong(3))).toMap
    val (lo, hi) = (h.values.head._1, h.values.head._2)
    assert(lo === 0.0 && hi === 99.0, s"edges pinned from the FIRST analyze: $lo..$hi")
    // replay: slice a bins by width 9.9; slice b (all > hi) clamps to bin 9
    val width = (hi - lo) / 10
    val expect = (0 until 300).map(i => (i + 1) % 100)
      .groupBy(x => math.min(math.max(math.floor((x - lo) / width), 0), 9).toLong)
      .view.mapValues(_.size.toLong).toMap
    (0L to 8L).foreach(bin => assert(h(bin)._3 === expect(bin), s"bin $bin"))
    assert(h(9L)._3 === expect(9L) + 100, "out-of-range appends clamp into the last bin")
    // covering analyze then full coverage answers with ZERO data reads
    assert(Warehouse.analyzeHistogram(spark, root, "v", bins = 10).nonEmpty)
    assert(Warehouse.analyzeHistogram(spark, root, "v", bins = 10).isEmpty)
    assert(corruptDataFiles(root) === 4)
    val h2 = Warehouse.histogramSnapshot(spark, root, "v", bins = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(h2 === h.view.mapValues(_._3).toMap, "full coverage must not open data files")
    // a different bins count is a different family: refuses until analyzed
    val e = intercept[Exception] {
      Warehouse.histogramSnapshot(spark, root, "v", bins = 7)
    }
    assert(e.getMessage.contains("analyzeHistogram"), e.getMessage)
  }

  test("all-NULL files are sentinel-covered: analyzed once, never re-scanned, 0.0 for empty columns") {
    val root = freshRoot("ndv_null")
    // range-partitioned so one file holds ONLY null nums
    val df = (1 to 200).map(i =>
      (i.toLong, if (i <= 100) None else Some((i % 13).toLong))).toDF("id", "num")
    df.repartitionByRange(2, $"id").write.parquet(s"$root-stage")
    val staged = spark.read.parquet(s"$root-stage")
    Warehouse.writeSnapshot(staged, root)
    assert(Warehouse.analyzeSnapshot(spark, root, Seq("num"), k = 16).nonEmpty)
    // full coverage claimed even though one file contributed no values
    assert(Warehouse.analyzeSnapshot(spark, root, Seq("num"), k = 16).isEmpty,
      "the all-NULL file must be sentinel-covered, not re-analyzed forever")
    val est = Warehouse.ndvSnapshot(spark, root, Seq("num"), k = 16).head().getDouble(1)
    assert(est === 13.0, s"13 distinct non-null values: $est")
    // zero data reads with the sentinel in place
    corruptDataFiles(root)
    assert(Warehouse.ndvSnapshot(spark, root, Seq("num"), k = 16).head().getDouble(1) === est)
    // an entirely-NULL column reports 0.0, not a missing row
    val root2 = freshRoot("ndv_allnull")
    val df2 = (1 to 50).map(i => (i.toLong, None: Option[Long])).toDF("id", "num")
    Warehouse.writeSnapshot(df2, root2)
    Warehouse.analyzeSnapshot(spark, root2, Seq("num"), k = 16)
    val z = Warehouse.ndvSnapshot(spark, root2, Seq("num"), k = 16).collect()
    assert(z.length === 1 && z.head.getDouble(1) === 0.0)
  }

  test("compactAnalyzeSidecars drops dead-file rows; answers unchanged; describe shows both") {
    val root = freshRoot("ndv_sweep")
    val df = table(200, 29)
    Warehouse.writeSnapshot(df.repartition(2), root)
    Warehouse.analyzeSnapshot(spark, root, Seq("num"), k = 16)
    Warehouse.analyzeHistogram(spark, root, "num", bins = 5)
    val before = Warehouse.ndvSnapshot(spark, root, Seq("num"), k = 16).head().getDouble(1)
    // compaction replaces every file: the old synopses go inert
    Warehouse.compactSnapshot(spark, root)
    val (sDropped, hDropped) = Warehouse.compactAnalyzeSidecars(spark, root)
    assert(sDropped > 0 && hDropped > 0, s"stale rows swept: $sDropped/$hDropped")
    // content identical -> re-analyze + same estimate, same histogram family edges
    Warehouse.analyzeSnapshot(spark, root, Seq("num"), k = 16)
    Warehouse.analyzeHistogram(spark, root, "num", bins = 5)
    assert(Warehouse.ndvSnapshot(spark, root, Seq("num"), k = 16).head().getDouble(1) === before)
    // a second sweep finds nothing
    assert(Warehouse.compactAnalyzeSidecars(spark, root) === ((0L, 0L)))
    val desc = Warehouse.describeSnapshot(spark, root)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val nFiles = desc("n_files").toInt
    assert(desc("synopsis.num") === s"k=16: $nFiles/$nFiles files covered", desc("synopsis.num"))
    assert(desc("histogram.num") === s"bins=5: $nFiles/$nFiles files covered",
      desc.get("histogram.num").toString)
  }

  test("histogram edge pin survives a sweep that kills the family's last file rows (r13)") {
    val root = freshRoot("ndv_edgepin")
    // pin edges on a 0..199 value range
    val df1 = (0 until 200).map(i => (i.toLong, i.toDouble)).toDF("id", "num")
    Warehouse.writeSnapshot(df1, root)
    Warehouse.analyzeHistogram(spark, root, "num", bins = 4)
    val h1 = Warehouse.histogramSnapshot(spark, root, "num", bins = 4)
      .select("lo", "hi").head()
    assert(h1.getDouble(0) === 0.0 && h1.getDouble(1) === 199.0)
    // full rewrite with a WIDER range: every analyzed file goes dead
    val df2 = (0 until 200).map(i => (i.toLong, i.toDouble * 10)).toDF("id", "num")
    Warehouse.writeSnapshot(df2, root)
    val (_, hDropped) = Warehouse.compactAnalyzeSidecars(spark, root)
    assert(hDropped > 0, "the family's file rows were dead and must sweep")
    // the next analyze must reuse the ORIGINAL pinned edges (values
    // beyond them clamping into the end bin), not silently re-pin
    Warehouse.analyzeHistogram(spark, root, "num", bins = 4)
    val h2 = Warehouse.histogramSnapshot(spark, root, "num", bins = 4).collect()
    assert(h2.forall(r => r.getDouble(1) === 0.0 && r.getDouble(2) === 199.0),
      s"edges must survive the sweep: ${h2.mkString(",")}")
    // bin 3 = [149.25, 199] plus every clamped value above the pinned
    // hi: x = 10i >= 149.25 ⟺ i >= 15 → 185 of the 200 rewritten rows
    val last = h2.find(_.getLong(0) === 3L).get.getLong(3)
    assert(last === 185L, s"clamp accounting under the surviving pin: $last")
    assert(h2.map(_.getLong(3)).sum === 200L)
    // the sentinel is inert for coverage: a second sweep is a no-op
    assert(Warehouse.compactAnalyzeSidecars(spark, root) === ((0L, 0L)))
  }

  test("ndvSnapshot refuses a degenerate k, matching kmvDistinct (r13)") {
    val root = freshRoot("ndv_kguard")
    Warehouse.writeSnapshot(table(50, 7), root)
    val e = intercept[IllegalArgumentException] {
      Warehouse.ndvSnapshot(spark, root, Seq("num"), k = 2)
    }
    assert(e.getMessage.contains("k must be >= 3"), e.getMessage)
  }

  test("dv-aware analyze: dv'd files live-scan subtracted, dv-free files stay zero-scan (r13)") {
    val root = freshRoot("ndv_dvaware")
    // file A (v=1): ids 1..100, then file B (v=2 append): ids 101..200
    val a = (1 to 100).map(i => (i.toLong, (i % 13).toLong)).toDF("id", "num")
    val b = (101 to 200).map(i => (i.toLong, (i % 29).toLong)).toDF("id", "num")
    Warehouse.writeSnapshot(a.coalesce(1), root)
    Warehouse.appendSnapshot(b.coalesce(1), root, 1L)
    Warehouse.analyzeSnapshot(spark, root, Seq("num"), k = 16)
    Warehouse.analyzeHistogram(spark, root, "num", bins = 5) // pins lo=0 hi=28
    // dv-delete rows that live only in file B
    Warehouse.deleteWhereDv(spark, root, col("id") > 150)
    // ndv == the estimator over the dv-subtracted table, NOT a refusal
    val est = Warehouse.ndvSnapshot(spark, root, Seq("num"), k = 16).head().getDouble(1)
    assert(est === kmvOf(Warehouse.readSnapshot(spark, root)
      .select(col("num")), "num", 16), "dv-subtracted equality")
    // histogram == binning the dv-subtracted table under the pinned edges
    val width = 28.0 / 5
    val want = Warehouse.readSnapshot(spark, root)
      .select(least(greatest(floor(col("num").cast("double") / width), lit(0L)),
        lit(4L)).cast("long").as("bin"))
      .groupBy("bin").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = Warehouse.histogramSnapshot(spark, root, "num", bins = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got === want, s"dv-subtracted histogram: $got vs $want")
    // zero-scan still holds for the dv-FREE file: corrupt file A's
    // data (v=1) — its synopsis answers; only file B live-scans
    val v1 = new java.io.File(s"$root/v=1")
    v1.listFiles.filter(f => f.isFile && !f.getName.startsWith("_") &&
        !f.getName.startsWith("."))
      .foreach { f =>
        val out = new java.io.FileOutputStream(f)
        out.write("not parquet".getBytes); out.close()
      }
    assert(Warehouse.ndvSnapshot(spark, root, Seq("num"), k = 16)
      .head().getDouble(1) === est, "dv-free files must answer from synopses")
    assert(Warehouse.histogramSnapshot(spark, root, "num", bins = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap === got)
    // the analyze tick never records a dv-carrying file: coverage over
    // the dv-free files is already complete, so both ticks are no-ops
    assert(Warehouse.analyzeSnapshot(spark, root, Seq("num"), k = 16).isEmpty)
    assert(Warehouse.analyzeHistogram(spark, root, "num", bins = 5).isEmpty)
  }

  test("estimateRows: within the clamped-bin bound, zero data I/O, declines without certification (r14)") {
    val root = freshRoot("est_rows")
    // num spans 1..400 uniformly over 2 files
    val df = (1 to 400).map(i => (i.toLong, i.toLong)).toDF("id", "num")
    Warehouse.writeSnapshot(df.repartition(2), root)
    // no family yet -> decline, never guess
    assert(Warehouse.estimateRows(spark, root, "num", 100, 200, bins = 8).isEmpty)
    Warehouse.analyzeHistogram(spark, root, "num", bins = 8)
    // zero data I/O: the estimate must answer from the side table alone
    assert(corruptDataFiles(root) === 2)
    val est = Warehouse.estimateRows(spark, root, "num", 100.5, 200.5, bins = 8).get
    // true count of num in [100.5, 200.5] is 100; edges pinned at
    // (1, 400), width 49.875: the bound is [fully-contained bins,
    // all intersecting bins]
    val width = (400.0 - 1.0) / 8
    def binRange(b: Int) = (1.0 + b * width, 1.0 + (b + 1) * width)
    val full = (0 until 8).filter { b =>
      val (l, h) = binRange(b); l >= 100.5 && h <= 200.5
    }
    val touch = (0 until 8).filter { b =>
      val (l, h) = binRange(b); h > 100.5 && l < 200.5
    }
    def countOf(bs: Seq[Int]): Double = bs.map { b =>
      val (l, h) = binRange(b)
      (1 to 400).count(v => v >= l && (v < h || (b == 7 && v <= h)))
    }.sum.toDouble
    assert(est >= countOf(full) && est <= countOf(touch),
      s"est $est outside [${countOf(full)}, ${countOf(touch)}]")
    // ...and the prorated estimate is actually close to the truth
    assert(math.abs(est - 100.0) <= width,
      s"est $est vs true 100 (width $width)")
    // a dv'd table declines: planning never scans
    val root2 = freshRoot("est_rows_dv")
    Warehouse.writeSnapshot(df, root2)
    Warehouse.analyzeHistogram(spark, root2, "num", bins = 8)
    Warehouse.deleteWhereDv(spark, root2, col("num") > 390L)
    assert(Warehouse.estimateRows(spark, root2, "num", 100, 200, bins = 8).isEmpty)
  }

  test("analyzeHistogram pins the family when every live file is dv'd; histogramSnapshot serves (r14)") {
    val root = freshRoot("hist_alldv")
    val df = (1 to 100).map(i => (i.toLong, i.toLong)).toDF("id", "num")
    Warehouse.writeSnapshot(df.coalesce(1), root)
    // one dv-erase touching THE only file: every live file now carries
    // a dv, so no file row can be recorded
    Warehouse.deleteWhereDv(spark, root, col("num") > 90L)
    // r13 refused into a loop here (analyze returned None without
    // creating the family; snapshot said "run analyzeHistogram first");
    // now the first analyze pins the family's edges via the sentinel
    val v = Warehouse.analyzeHistogram(spark, root, "num", bins = 5)
    assert(v.nonEmpty, "the first analyze must create the family")
    // edges describe the LIVE rows (dv-subtracted min/max: 1..90)
    val hist = Warehouse.histogramSnapshot(spark, root, "num", bins = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
    assert(hist.map(_._4).sum === 90L, hist.mkString(", "))
    assert(hist.forall(h => h._2 === 1.0 && h._3 === 90.0), hist.mkString(", "))
    // a second analyze in the same state is a clean no-op, not a
    // sentinel duplicator
    assert(Warehouse.analyzeHistogram(spark, root, "num", bins = 5).isEmpty)
    // the edge-pinned family is VISIBLE in the coverage report as 0/N
    // instead of vanishing (r14)
    val desc0 = Warehouse.describeSnapshot(spark, root)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(desc0.get("histogram.num").exists(_.startsWith("bins=5: 0/")),
      desc0.filter(_._1.startsWith("histogram")).toString)
    // after a purge the next tick records real file rows under the
    // SAME pinned edges
    Warehouse.materializeDeletes(spark, root)
    assert(Warehouse.analyzeHistogram(spark, root, "num", bins = 5).nonEmpty)
    val hist2 = Warehouse.histogramSnapshot(spark, root, "num", bins = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
    assert(hist2.map(_._4).sum === 90L)
    assert(hist2.forall(h => h._2 === 1.0 && h._3 === 90.0))
  }

  test("unknown column refuses loudly") {
    val root = freshRoot("ndv_badcol")
    Warehouse.writeSnapshot(table(100, 11), root)
    val bad = intercept[IllegalArgumentException] {
      Warehouse.analyzeSnapshot(spark, root, Seq("nope"), k = 16)
    }
    assert(bad.getMessage.contains("nope"))
  }
}
