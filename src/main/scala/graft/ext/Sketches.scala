package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Count-Min sketch (X213) — frequency estimation in FIXED memory:
  * `lanes × width` counters regardless of key cardinality, the
  * structure that answers "how often does key x appear in 100 TB"
  * without a key-grain aggregate. Overestimate-only by construction
  * (collisions add, never subtract): estimate ≥ true count always,
  * and ≤ true + ε·N with probability 1−δ for ε = e/width, δ = e^−lanes
  * (Cormode & Muthukrishnan 2005).
  *
  * ENGINE-PORTABLE by the X187 md5-lane contract: lane i hashes a key
  * to `32-bit md5 hex window i mod width`, so any engine recomputes
  * the SAME counters and the SAME collisions — the estimates
  * hash-match a DuckDB recomposition exactly, where a JVM-seeded hash
  * would be internal. The relationship to
  * [[graft.ops.Relational.countMinSketchOf]] mirrors X187's
  * flagBloom/flagBloomMd5 split: that one wraps Spark's built-in
  * `count_min_sketch` aggregate into a DRIVER-side probe object
  * (fast, JVM-internal layout); this one is a DataFrame all the way —
  * portable bits, distributed probes, and the cross-engine oracle.
  * The sketch is a (lane, bucket) → count frame:
  * built by one hash-aggregate over the data (map-side combine, no
  * key-grain shuffle — the aggregate domain is lanes × width), merged
  * across shards/days by ADDITION ([[mergeSketches]] — the linearity
  * that makes it a streaming/partitioned-ingest citizen), probed by a
  * broadcast join (the sketch is tiny by construction).
  */
object Sketches {

  private def laneBuckets(h: org.apache.spark.sql.Column, width: Long, lanes: Int) =
    explode(array((0 until lanes).map(i =>
      struct(lit(i).as("lane"),
        (conv(substring(h, i * 8 + 1, 8), 16, 10).cast("long") % width)
          .as("bucket"))): _*)).as("lb")

  /** Build the sketch: (lane, bucket, c) with c = rows whose key
    * hashes there. NULL keys are skipped (they are not a frequency).
    *
    * ONE-PASS build (r14): the counters accumulate in a single
    * `lanes × width` long-array aggregation buffer
    * ([[graft.functions.CountMinAgg]]) — per input row the kernel bumps
    * `lanes` counters in place and generates nothing, partials merge by
    * addition, and only the final merged buffer explodes into ≤
    * lanes × width cell rows. The previous shape exploded `lanes`
    * structs per INPUT row before the partial agg (a 4× row blowup
    * through the whole scan — measured 2.4 M generated rows and 5.9×
    * the DuckDB recomposition at sf0.1); same md5-window counters
    * bit-for-bit, so the emitted frame and the oracle are unchanged.
    */
  def countMinSketch(df: DataFrame, keyCol: String,
                     width: Long = 1L << 11, lanes: Int = 4): DataFrame = {
    require(width >= 2, s"width must be >= 2, got $width")
    require(lanes >= 1 && lanes <= 4,
      s"lanes must be 1..4 (md5 yields four 32-bit windows), got $lanes")
    df.select(md5(col(keyCol).cast("string")).as("h"))
      .where(col("h").isNotNull)
      .agg(graft.functions.native.countMinCells(col("h"), width, lanes).as("cells"))
      .select(explode(col("cells")).as("cell"))
      .select(col("cell.lane").as("lane"), col("cell.bucket").as("bucket"),
        col("cell.c").as("c"))
      // the geometry RIDES the sketch (review r11): probing or merging
      // under a different (width, lanes) silently UNDERestimates —
      // the one failure mode Count-Min promises away — so consumers
      // validate against these instead of trusting their parameters
      .withColumn("width", lit(width))
      .withColumn("lanes", lit(lanes))
  }

  /** Geometry guard FUSED into the sketch plan (review r11: an eager
    * validation action would evaluate a derived sketch twice): every
    * row asserts its riding (width, lanes) against the expected pair
    * via `raise_error`, and the broadcast/merge that consumes the
    * frame materializes every row — so a mismatch or a mixed-geometry
    * union always fires, with zero extra passes.
    */
  private def geometryGuard(sketch: DataFrame, width: Long, lanes: Int,
                            what: String): DataFrame =
    sketch.filter(when(col("width") =!= width || col("lanes") =!= lanes,
      raise_error(concat(lit(s"$what: sketch built with (width="), col("width"),
        lit(", lanes="), col("lanes"),
        lit(s") used with (width=$width, lanes=$lanes) - a mismatch underestimates"))))
      .otherwise(lit(true)))

  /** Merge sketches built with the SAME (width, lanes): counters add.
    * The linearity is the point — per-shard/per-day sketches fold into
    * the global one without touching the data again.
    */
  def mergeSketches(sketches: DataFrame*): DataFrame = {
    require(sketches.nonEmpty, "mergeSketches needs at least one sketch")
    val all = sketches.reduce(_ unionByName _)
    // fused mixed-geometry guard: adding counters across geometries
    // corrupts irrecoverably, so every row must agree with the first
    // sketch's riding pair; one cheap single-row probe reads that pair
    // (review r11: a distinct().count() here evaluated every input
    // sketch twice)
    val head = sketches.head.select("width", "lanes").head(1)
    head.headOption.fold(all) { r =>
      geometryGuard(all, r.getLong(0), r.getInt(1), "mergeSketches")
    }.groupBy("lane", "bucket", "width", "lanes").agg(sum(col("c")).as("c"))
      .select("lane", "bucket", "c", "width", "lanes")
  }

  /** Point estimates for the probe frame's keys: min over the key's
    * lane counters (an empty bucket reads 0 — the key never appeared).
    * The sketch side broadcasts: ≤ lanes × width rows by construction.
    */
  def countMinEstimate(sketch: DataFrame, probes: DataFrame, keyCol: String,
                       width: Long = 1L << 11, lanes: Int = 4): DataFrame = {
    val guarded = geometryGuard(sketch, width, lanes, "countMinEstimate")
    probes.select(col(keyCol)).distinct()
      .withColumn("h", md5(col(keyCol).cast("string")))
      .select(col(keyCol), laneBuckets(col("h"), width, lanes))
      .select(col(keyCol), col("lb.lane").as("lane"), col("lb.bucket").as("bucket"))
      // the broadcast build materializes EVERY sketch row, so the
      // fused guard fires on any mismatch even when no probe matches
      .join(broadcast(guarded.select("lane", "bucket", "c")),
        Seq("lane", "bucket"), "left")
      .groupBy(keyCol)
      .agg(min(coalesce(col("c"), lit(0L))).as("cm_estimate"))
  }

  /** STREAMING Count-Min maintenance: each micro-batch's delta sketch
    * merges into a snapshot-table sketch — counters ADD (the
    * linearity again), so the table converges to the sketch of
    * everything the stream ever carried. Exactly-once by composition:
    * the X184 streaming-merge epoch gate makes a replayed batch a
    * no-op, which for an ADDITIVE update is correctness, not
    * optimization (a replay would double-count). The sketch table
    * stays ≤ lanes × width rows forever — the bounded-state streaming
    * aggregate without watermarks or state-store tuning; probe it any
    * time with [[countMinEstimate]] over `readSnapshot`.
    */
  def countMinSink(source: DataFrame, path: String, checkpoint: String,
                   appId: String, keyCol: String,
                   width: Long = 1L << 11, lanes: Int = 4)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    // the merge sink needs a table to merge INTO: seed an empty
    // sketch once, at sink construction (driver-side, before any
    // batch — a restart sees the committed table and skips, so the
    // seed never races the epoch gate)
    val spark = source.sparkSession
    // a restarted (or second) sink must match the table's recorded
    // geometry (review r11): merging on (lane, bucket) across widths
    // would corrupt counters irrecoverably — refuse at construction
    if (graft.store.Warehouse.snapshots(spark, path).nonEmpty) {
      val meta = graft.store.Warehouse.readSnapshot(spark, path)
        .select("width", "lanes").head(1)
      meta.headOption.foreach { r =>
        require(r.getLong(0) == width && r.getInt(1) == lanes,
          s"countMinSink($path): table sketch has (width=${r.getLong(0)}, " +
            s"lanes=${r.getInt(1)}), sink configured (width=$width, lanes=$lanes)")
      }
    }
    if (graft.store.Warehouse.snapshots(spark, path).isEmpty) {
      import org.apache.spark.sql.types._
      graft.store.Warehouse.writeSnapshot(
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          StructType(Seq(StructField("lane", IntegerType, nullable = false),
            StructField("bucket", LongType, nullable = true),
            StructField("c", LongType, nullable = false),
            StructField("width", LongType, nullable = false),
            StructField("lanes", IntegerType, nullable = false)))), path)
    }
    source.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, epoch: Long) =>
        graft.store.Warehouse.commitStreamMerge(
          countMinSketch(batch, keyCol, width, lanes), path, appId, epoch,
          keys = Seq("lane", "bucket"),
          clauses = Seq(
            graft.store.Warehouse.UpdateWhen(lit(true),
              Map("c" -> (col("t.c") + col("s.c")))),
            graft.store.Warehouse.InsertWhen(lit(true))))
        ()
      }
  }

  /** CONSISTENT (bottom-k priority) key sample (X214): the k distinct
    * keys with the smallest md5 priority, then every row of those keys
    * — coordinated sampling. A key's priority depends on NOTHING but
    * the key, which is the property random sampling lacks: the same
    * key draws the same priority in every table, every day, every
    * engine, so per-table samples of a shared key domain are JOINABLE
    * (sample customers once, and the orders/lineitem samples built the
    * same way contain exactly those customers' rows), re-runs are
    * reproducible, and growing k only ADDS keys (nested samples). At
    * scale: the key ranking is a distributed top-k
    * (TakeOrderedAndProject — no global sort), the row pull a
    * broadcast semi-join on k keys; at 100 TB the pull prunes files
    * when the table clusters on the key. md5 ties are broken by the
    * key itself, so the sample is total-order deterministic even under
    * (astronomically unlikely) digest collisions.
    */
  def consistentKeySample(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val keys = df.select(col(keyCol)).where(col(keyCol).isNotNull).distinct()
      .withColumn("__pri", md5(col(keyCol).cast("string")))
      .orderBy(col("__pri"), col(keyCol))
      .limit(k)
      .drop("__pri")
    df.join(broadcast(keys), Seq(keyCol), "left_semi")
  }

  /** KMV (bottom-k minimum values) distinct-count sketch (X223) — the
    * md5-portable twin the approx-distinct family was missing, the
    * X153/X187/X213 move: per group, the k smallest md5-derived
    * priorities of the DISTINCT values estimate the distinct count as
    * `(k−1) / u_k` (u_k = the k-th smallest priority scaled into
    * (0, 1]; standard KMV, relative error ≈ 1/√(k−2)), and a group
    * with fewer than k distinct values reports EXACTLY. Every term is
    * engine-recomposable: the priority is a 60-bit md5 window (exact
    * as a long; the long→double conversion and the power-of-two scale
    * divide round identically under IEEE), u_k is a max over the
    * bottom-k rows, and the estimate is one division — so another
    * engine rebuilds the SAME estimate bit-for-bit, where HLL's
    * `approx_count_distinct` is a Spark-private register layout
    * (rows-only forever). This is the VERIFICATION-grade portable
    * form; the production scale form stays X22's
    * `approx_count_distinct` (one pass, no per-group sort). Plan: one
    * distinct on (group, value), one windowed bottom-k per group —
    * both shuffles at value grain, nothing driver-side.
    */
  /** Coordinated-sample quantile estimates (X224) — the portable twin
    * of the approx-quantile family (X65's `approx_percentile` is a
    * Spark-private KLL-ish sketch, rows-only forever): per group, keep
    * the k rows with the smallest md5 priority of their ID — a
    * UNIFORM, coordinated, reproducible row sample (the X214 priority
    * rule at row grain) — then take EXACT interpolated percentiles of
    * the sampled values. Both halves recompose cross-engine: the
    * sample is a deterministic md5 bottom-k (ties on the id), and
    * Spark's `percentile` interpolation ≡ DuckDB's `quantile_cont`
    * (the q_quantiles precedent), so the ESTIMATES hash-match
    * bit-for-bit, sampling error included. Estimate quality is the
    * standard order-statistic bound (±O(1/√k) in rank). Verification-
    * grade portable form; the one-pass production scale form stays
    * X65. Plan: one windowed bottom-k (group grain), one exact
    * percentile over ≤ k rows per group.
    */
  def sampledQuantiles(df: DataFrame, groupCols: Seq[String], valueCol: String,
                       idCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val g = groupCols.map(col)
    val w = Window.partitionBy(g: _*).orderBy(col("__pri"), col(idCol))
    df.where(col(valueCol).isNotNull)
      .withColumn("__pri", md5(col(idCol).cast("string")))
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") <= k)
      .groupBy(g: _*)
      .agg(expr(s"percentile($valueCol, 0.5)").as("p50"),
        expr(s"percentile($valueCol, 0.9)").as("p90"),
        expr(s"percentile($valueCol, 0.99)").as("p99"))
  }

  /** PRIORITY SAMPLING (X228) — Duffield–Lund–Thorup: the k rows with
    * the largest priority `q_i = w_i / u_i` (u_i uniform in (0,1]),
    * each carrying the weight estimate `ŵ_i = max(w_i, τ)` where τ is
    * the (k+1)-th largest priority. The weighted complement of X214's
    * uniform coordinated sample: ANY subset-sum over the population is
    * estimated unbiasedly by summing ŵ over the sample's matching rows
    * — the canonical "keep k documents but preserve every slice's
    * token mass" primitive a corpus subsampler needs (uniform sampling
    * starves heavy docs; deterministic top-k by weight has no
    * estimator at all). Heavy rows (w_i ≥ τ) enter with certainty and
    * keep their exact weight — the sample IS the top of the
    * distribution plus a fair lottery over the tail.
    *
    * Engine-portable by the X223 contract: u_i is the 60-bit md5
    * window of the row ID, +1, scaled into (0,1] — reproducible,
    * coordinated (re-runs and other engines draw the same sample) —
    * and every derived term is one IEEE division (q), one comparison
    * (the top-k cut, ties broken on the ID), one max (ŵ). DuckDB
    * rebuilds the identical sample and identical estimates, sampling
    * randomness included.
    *
    * Plan: one column-pruned scan, one distributed top-(k+1)
    * (TakeOrderedAndProject — no global sort), τ split off as a
    * 1-row broadcast. At 100 TB the only full-data pass is the scan
    * that computes priorities.
    */
  def prioritySample(df: DataFrame, idCol: String, weightCol: String,
                     k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // +1 before scaling: the raw 60-bit window lies in [0, 2^60−1], so
    // (window+1)/2^60 is genuinely in (0,1] as the DLT estimator
    // assumes — without it a (2^-60-improbable) u=0 row would get
    // q = w/0 = +Inf and be unconditionally sampled (r13 ADVICE fix;
    // integers ≤ 2^60 are exact in float64, so the shift is itself
    // engine-exact)
    val u = ((conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10)
      .cast("long") + 1).cast("double") / lit(math.pow(2.0, 60.0)))
    val pri = df
      .where(col(idCol).isNotNull && col(weightCol).isNotNull && col(weightCol) > 0)
      .select(col(idCol), col(weightCol).cast("double").as("w"),
        (col(weightCol).cast("double") / u).as("__q"))
      .orderBy(col("__q").desc, col(idCol))
      .limit(k + 1)
      // top-(k+1) feeds both τ and the kept rows; k+1 rows, but the
      // subtree is a full-table TakeOrdered — always materialize (the
      // nearDupClusters unconditional-checkpoint precedent), or each
      // consumer would re-scan the table
      .localCheckpoint(true)
    // τ = the (k+1)-th largest priority; when the population has ≤ k
    // qualifying rows there is none, and τ = 0 makes every estimate
    // exact (ŵ = w) — the estimator's own small-population case
    val tau = pri.agg(count(lit(1)).as("__n"), min(col("__q")).as("__qmin"))
      .select(when(col("__n") === (k + 1), col("__qmin")).otherwise(lit(0.0))
        .as("__tau"))
    val kept = pri.orderBy(col("__q").desc, col(idCol)).limit(k)
    kept.crossJoin(broadcast(tau))
      .select(col(idCol), col("w"),
        greatest(col("w"), col("__tau")).as("w_est"))
  }

  def kmvDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  k: Int): DataFrame = {
    require(k >= 3, s"k must be >= 3 for the (k-1)/u_k estimator, got $k")
    val g = groupCols.map(col)
    val u = (conv(substring(md5(col(valueCol).cast("string")), 1, 15), 16, 10)
      .cast("long").cast("double") / lit(math.pow(2.0, 60.0))).as("__u")
    val w = Window.partitionBy(g: _*).orderBy(col("__u"), col(valueCol))
    df.where(col(valueCol).isNotNull)
      .select((g :+ col(valueCol)): _*).distinct()
      .select((g :+ u :+ col(valueCol)): _*)
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") <= k)
      .groupBy(g: _*)
      .agg(count(lit(1)).as("__n"), max(col("__u")).as("__uk"))
      .select((g :+
        when(col("__n") < k, col("__n").cast("double"))
          .otherwise(lit((k - 1).toDouble) / col("__uk")).as("distinct_est")): _*)
  }
}
