package graft.ext

import graft.SparkSpec
import graft.store.Warehouse
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** X213 Count-Min sketch — fixed-memory frequency estimation with the
  * engine-portable md5-lane contract; overestimate-only, linear under
  * merge.
  */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private val data = ((1 to 100).flatMap(i => Seq.fill(i % 5 + 1)(s"k$i")))
    .toDF("k") // k_i appears (i % 5 + 1) times

  test("estimates never underestimate; a wide sketch is exact") {
    val truth = data.groupBy("k").agg(count(lit(1)).as("t"))
    val sk = Sketches.countMinSketch(data, "k", width = 1L << 16)
    val est = Sketches.countMinEstimate(sk, truth, "k", width = 1L << 16)
    val joined = est.join(truth, "k")
      .select(col("t"), col("cm_estimate")).collect()
    assert(joined.forall(r => r.getLong(1) >= r.getLong(0)),
      "Count-Min can only overestimate")
    // 100 keys in 4 × 65536 buckets: collisions are practically absent
    assert(joined.forall(r => r.getLong(1) === r.getLong(0)),
      "a sketch much wider than the key set is exact")
  }

  test("a tight sketch overestimates some keys but never loses a count") {
    val truth = data.groupBy("k").agg(count(lit(1)).as("t"))
    val sk = Sketches.countMinSketch(data, "k", width = 16, lanes = 2)
    val est = Sketches.countMinEstimate(sk, truth, "k", width = 16, lanes = 2)
    val joined = est.join(truth, "k").select(col("t"), col("cm_estimate")).collect()
    assert(joined.forall(r => r.getLong(1) >= r.getLong(0)))
    assert(joined.exists(r => r.getLong(1) > r.getLong(0)),
      "100 keys in 16 buckets must collide somewhere")
  }

  test("one-pass buffer build == the exploded md5-lane recomposition, partition-invariant (r14)") {
    // counter identity: the CountMinAgg buffer must reproduce the
    // conv(substring(md5)) % width counters the exploded plan computed
    // — the same expression the DuckDB oracle recomposes
    def exploded(df: org.apache.spark.sql.DataFrame, width: Long, lanes: Int) =
      df.select(md5(col("k").cast("string")).as("h"))
        .where(col("h").isNotNull)
        .select(explode(array((0 until lanes).map(i =>
          struct(lit(i).as("lane"),
            (conv(substring(col("h"), i * 8 + 1, 8), 16, 10).cast("long") % width)
              .as("bucket"))): _*)).as("lb"))
        .groupBy(col("lb.lane").as("lane"), col("lb.bucket").as("bucket"))
        .agg(count(lit(1)).as("c"))
    for ((w, l) <- Seq((1024L, 4), (16L, 2), (2L, 1))) {
      val fast = Sketches.countMinSketch(data, "k", width = w, lanes = l)
        .select("lane", "bucket", "c")
      val slow = exploded(data, w, l)
      assert(fast.exceptAll(slow).isEmpty && slow.exceptAll(fast).isEmpty,
        s"(width=$w, lanes=$l): buffer build diverged from the exploded form")
    }
    // merge associativity: the partial buffers' element-wise addition
    // must make the result independent of partitioning
    val p1 = Sketches.countMinSketch(data.coalesce(1), "k", width = 64)
      .select("lane", "bucket", "c")
    val p13 = Sketches.countMinSketch(data.repartition(13), "k", width = 64)
      .select("lane", "bucket", "c")
    assert(p1.exceptAll(p13).isEmpty && p13.exceptAll(p1).isEmpty,
      "counters must not depend on partition count")
    // null keys are skipped, not a frequency; an all-null input yields
    // an EMPTY sketch frame (zero cells), not a row of zeros
    val withNulls = (Seq("a", null, "a", null): Seq[String]).toDF("k")
    val nn = Sketches.countMinSketch(withNulls, "k", width = 64)
    // each lane's counters sum to the non-null row count
    assert(nn.filter(col("lane") === 0).agg(sum("c")).head().getLong(0) === 2L)
    assert(Sketches.countMinSketch(
      (Seq(null, null): Seq[String]).toDF("k"), "k", width = 64).count() === 0L)
  }

  test("geometry rides the sketch: a mismatched probe or merge refuses (review r11)") {
    // the guard is FUSED into the plan (zero extra passes), so it
    // fires at execution — the broadcast build materializes every
    // sketch row, mismatch or not
    val sk = Sketches.countMinSketch(data, "k", width = 1024)
    val e = intercept[Exception] {
      Sketches.countMinEstimate(sk, Seq("k1").toDF("k"), "k", width = 2048).collect()
    }
    assert(e.getMessage.contains("underestimates"))
    val e2 = intercept[Exception] {
      Sketches.mergeSketches(sk, Sketches.countMinSketch(data, "k", width = 64))
        .collect()
    }
    assert(e2.getMessage.contains("mergeSketches"))
  }

  test("streaming sink: the sketch table converges to the sketch of everything streamed") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cms").toString
    val root = s"$dir/t"
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[String]
    def drain(ck: String): Unit = {
      val q = Sketches.countMinSink(mem.toDF().withColumnRenamed("value", "k"),
        root, s"$dir/$ck", appId = "cm-spec", keyCol = "k", width = 64)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    mem.addData("a", "b", "a")
    drain("ck")
    mem.addData("b", "c")
    drain("ck")
    val streamed = Warehouse.readSnapshot(spark, root)
    val direct = Sketches.countMinSketch(
      Seq("a", "b", "a", "b", "c").toDF("k"), "k", width = 64)
    assert(streamed.exceptAll(direct).isEmpty && direct.exceptAll(streamed).isEmpty,
      "incrementally merged counters must equal the one-shot sketch")
    val est = Sketches.countMinEstimate(streamed, Seq("a", "b", "c").toDF("k"), "k",
      width = 64).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("a") >= 2L && est("b") >= 2L && est("c") >= 1L)
  }

  test("consistent sample: coordinated across tables, nested in k, all rows of a key") {
    val orders = (1 to 200).map(i => (i.toLong, s"o$i")).toDF("ck", "o")
    val items = (1 to 200).flatMap(i => Seq.fill(3)((i.toLong, s"i$i"))).toDF("ck", "it")
    val sampledO = Sketches.consistentKeySample(orders, "ck", 20)
    val sampledI = Sketches.consistentKeySample(items, "ck", 20)
    val keysO = sampledO.select("ck").distinct().collect().map(_.getLong(0)).toSet
    val keysI = sampledI.select("ck").distinct().collect().map(_.getLong(0)).toSet
    assert(keysO === keysI, "same key domain -> same sampled keys (joinable samples)")
    assert(sampledI.count() === 60, "every row of a sampled key comes along")
    val keys30 = Sketches.consistentKeySample(orders, "ck", 30)
      .select("ck").distinct().collect().map(_.getLong(0)).toSet
    assert(keysO.subsetOf(keys30), "growing k only adds keys (nested samples)")
  }

  test("KMV distinct: exact under k, bounded relative error above it, duplicates invisible (X223)") {
    // group "small" has 40 distinct values (< k=64: exact), group "big"
    // 5000 (estimated); every value appears 3x — multiplicity must not
    // move a DISTINCT estimate
    val rows = (1 to 40).map(v => ("small", v.toLong)) ++
      (1 to 5000).map(v => ("big", 100000L + v))
    val df = rows.flatMap(r => Seq(r, r, r)).toDF("g", "v")
    val est = Sketches.kmvDistinct(df, Seq("g"), "v", k = 64).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(est("small") === 40.0, "below k the sketch reports the exact distinct count")
    val rel = math.abs(est("big") - 5000.0) / 5000.0
    assert(rel < 0.5, s"KMV k=64 (stderr ~ 1/sqrt(62) = 0.127) way off: ${est("big")}")
    // NULL values never count
    val withNulls = Seq(("g", Some(1L)), ("g", None), ("g", Some(2L))).toDF("g", "v")
    assert(Sketches.kmvDistinct(withNulls, Seq("g"), "v", 64).head().getDouble(1) === 2.0)
  }

  test("sampled quantiles: exact under k, near-exact ranks above it (X224)") {
    // group under k: the sample IS the group — estimates equal the
    // exact interpolated percentiles
    val small = (1 to 100).map(i => ("s", i.toLong, i.toDouble)).toDF("g", "id", "v")
    val es = Sketches.sampledQuantiles(small, Seq("g"), "v", "id", k = 512).head()
    val ex = small.groupBy("g").agg(
      expr("percentile(v, 0.5)"), expr("percentile(v, 0.9)"), expr("percentile(v, 0.99)")).head()
    assert((es.getDouble(1), es.getDouble(2), es.getDouble(3)) ===
      ((ex.getDouble(1), ex.getDouble(2), ex.getDouble(3))))
    // group over k: uniform 1..20000 — sampled p50 must land within
    // the order-statistic band (~1/sqrt(512) of rank, ~5% here at 3 sigma)
    val big = (1 to 20000).map(i => ("b", i.toLong, i.toDouble)).toDF("g", "id", "v")
    val eb = Sketches.sampledQuantiles(big, Seq("g"), "v", "id", k = 512).head()
    assert(math.abs(eb.getDouble(1) - 10000.0) / 20000.0 < 0.08,
      s"sampled p50 ${eb.getDouble(1)} too far from 10000")
    assert(math.abs(eb.getDouble(2) - 18000.0) / 20000.0 < 0.08,
      s"sampled p90 ${eb.getDouble(2)} too far from 18000")
  }

  test("merge linearity: sketch(A) + sketch(B) == sketch(A ++ B); absent key reads 0") {
    val a = data.filter(col("k") < "k5")
    val b = data.filter(col("k") >= "k5")
    val merged = Sketches.mergeSketches(
      Sketches.countMinSketch(a, "k", width = 64),
      Sketches.countMinSketch(b, "k", width = 64))
    val direct = Sketches.countMinSketch(data, "k", width = 64)
    assert(merged.exceptAll(direct).isEmpty && direct.exceptAll(merged).isEmpty,
      "counters must add exactly")
    val ghost = Sketches.countMinEstimate(direct, Seq("never-seen").toDF("k"), "k",
      width = 64)
    // an unseen key can still collide into occupied buckets in a tight
    // sketch — but with every lane empty it must read 0; assert the
    // weaker overestimate-only contract plus the wide-sketch zero
    val wide = Sketches.countMinEstimate(
      Sketches.countMinSketch(data, "k", width = 1L << 16),
      Seq("never-seen").toDF("k"), "k", width = 1L << 16)
    assert(ghost.head().getLong(1) >= 0L)
    assert(wide.head().getLong(1) === 0L, "empty lanes read zero")
  }

  test("prioritySample: certainty for heavy rows, exact under k, unbiased subset sums (X228)") {
    // one whale among minnows: w=10000 vs w=1. Its priority w/u >= w
    // dominates every minnow's maximum possible priority except the
    // vanishing tail, so it is sampled with (near-)certainty
    val rows = (1L to 400L).map(i => (i, if (i == 7L) 10000L else 1L))
      .toDF("id", "w")
    val s = Sketches.prioritySample(rows, "id", "w", k = 20).collect()
    assert(s.length === 20)
    val byId = s.map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(byId.contains(7L), "the heavy row enters with certainty")
    assert(byId(7L)._2 === 10000.0, "a heavy row keeps its exact weight (w >= tau)")
    // tau-adjusted estimates: sum of w_est over the sample estimates
    // the population total (10399). Deterministic sample -> fixed
    // outcome; assert the estimator lands within 30%
    val est = s.map(_.getDouble(2)).sum
    assert(math.abs(est - 10399.0) / 10399.0 < 0.3, s"subset-sum estimate $est vs 10399")
    // population <= k: every row kept, tau = 0, estimates exact
    val tiny = (1L to 5L).map(i => (i, i * 10L)).toDF("id", "w")
    val all = Sketches.prioritySample(tiny, "id", "w", k = 20).collect()
    assert(all.length === 5)
    assert(all.forall(r => r.getDouble(2) === r.getDouble(1)),
      "no (k+1)-th priority exists -> tau=0 -> w_est = w exactly")
    // reproducible: the md5 priorities fix the sample across runs
    val again = Sketches.prioritySample(rows, "id", "w", k = 20).collect()
      .map(_.getLong(0)).sorted
    assert(again.toSeq === s.map(_.getLong(0)).sorted.toSeq)
    // non-positive weights are excluded, not divided by
    val withZero = rows.union(Seq((500L, 0L), (501L, -3L)).toDF("id", "w"))
    val ids = Sketches.prioritySample(withZero, "id", "w", k = 500).collect().map(_.getLong(0))
    assert(!ids.contains(500L) && !ids.contains(501L))
  }
}
