package graft.ext

import graft.store.Warehouse
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTED SHINGLE-LSH INDEX (X250, r15) — the X247 move applied to
  * the MinHash near-dup family: build the catalog's banded signatures
  * once, screen every future increment against them with a PRUNED
  * bucket read.
  *
  * Every shingle screen in [[Dedup]] is self-contained: it re-shingles
  * and re-hashes BOTH corpora per call, which is the right shape for a
  * one-shot dedup pass and the wrong one for the steady-state crawl
  * loop over a 100 TB corpus — the catalog's signatures are identical
  * every cycle and recomputing them is a full corpus scan per screen
  * (the Σdf² ceiling X102's own row documents). This module
  * materializes the banded-signature structure as warehouse snapshot
  * tables and turns a screen into increment bytes + probed buckets:
  *
  *  - the INDEX table at `path`: one row per (doc, band) —
  *    `(bucket, band, bk, doc_id, n_sh, shh)` — range-partitioned on
  *    `bucket` at build, so every data file holds a contiguous bucket
  *    range and the manifest's per-file min/max stats (X162) prune
  *    non-probed buckets at the FILE level. Each row carries the
  *    doc's distinct shingle-hash array `shh`, so the exact-Jaccard
  *    verify reads NOTHING beyond the probed rows — the catalog text
  *    is never touched again (`bands`× signature duplication is the
  *    standard index trade: storage for probe locality);
  *  - the META table at `path + "_meta"`: one row
  *    `(mode, n, nb, bands, stamp)` fixing the construction every
  *    probe and refresh must reproduce. `stamp` is the index version
  *    the build pairs with — a rebuild that crashes between its two
  *    commits leaves `stamp` ahead of the index table, and probes
  *    REFUSE loudly instead of screening against signatures built
  *    under different parameters (the r14 VectorIndex review's
  *    torn-build hazard, closed here by construction).
  *
  * Two modes, the [[Dedup]] family's own split:
  *  - `"md5"` (default, engine-portable): the q_dedup_minhash_md5
  *    construction verbatim — base h = first 15 md5 hex chars of the
  *    shingle as a 60-bit long, 8 universal hashes over h mod P
  *    (P = 2³¹−1, params [[Dedup.Md5MinhashParams]]), 4 bands × 2
  *    rows packed as `bk = m₂ₖ·2³¹ + m₂ₖ₊₁`. Any engine recomposes
  *    the whole screen bit-identically (oracle key
  *    q_dedup_shingle_indexed); Jaccard is computed over the DISTINCT
  *    60-bit shingle hashes, which is collision-safe per doc (a
  *    10⁴-shingle doc collides with probability ~10⁻¹⁰ — and only
  *    same-doc collisions can move a Jaccard value);
  *  - `"xxh"` (performance): [[Dedup.minhashNearDups]]'s codegen
  *    kernel — 128 xxhash64-based hashes, 16 bands, one
  *    [[graft.functions.MinHashBandKeysExpr]] evaluation per row —
  *    with `shh` as the doc's distinct xxhash64 shingle hashes.
  *
  * The CANDIDATE rule is band-key equality, exactly the inline
  * screens' rule — `bucket` is a deterministic COARSENING of
  * (band, bk) used only for file layout, so pruning changes which
  * files open, never which pairs verify: the screen over (catalog,
  * increment) equals [[Dedup.minhashNearDupsMd5]] (resp.
  * [[Dedup.minhashNearDups]]) restricted to cross pairs
  * (ShingleIndexSpec pins the equivalence; the md5 oracle pins it
  * cross-engine).
  *
  * INCREMENTAL growth rides the X200 refresh discipline:
  * [[refreshShingleIndex]] signs ONLY docs not yet indexed (anti-join
  * on doc_id) under the STORED meta and appends — the steady-state
  * tick costs the new docs' bytes. [[shingleIndexSink]] streams the
  * same refresh exactly-once by the anti-join's own idempotence
  * (the X248 argument), and [[maintainShingleIndex]] bin-packs the
  * per-epoch small files with the bucket clustering FORCED so
  * compaction can never silently kill probe pruning (the r14
  * VectorIndex lesson).
  *
  * 100 TB shape: a crawl-cycle screen prices at
  * increment-shingling + (hit buckets / (bands·nb)) of the index
  * bytes + one candidate-grain shuffle — never a catalog re-shingle,
  * never Σdf² over the catalog. `nb` trades probe selectivity
  * against per-bucket file counts; at corpus scale raise it so a hit
  * bucket stays a small fraction of the band's bytes.
  */
object ShingleIndex {

  private val Md5Mode = "md5"
  private val XxhMode = "xxh"
  private val P = 2147483647L // 2^31 - 1, the md5-family universal-hash modulus
  private val Pack = 2147483648L // 2^31: bk = m_even * Pack + m_odd (both < P, fits a long)
  private val XxhNumHashes = 128
  private val XxhBands = 16

  def metaPath(path: String): String = s"${path}_meta"

  private def bandsOf(mode: String): Int =
    if (mode == Md5Mode) 4 else XxhBands

  private case class Meta(mode: String, n: Int, nb: Int, bands: Int, stamp: Long)

  /** The uniform index-row frame for `docs` under a mode:
    * (bucket, band, bk, doc_id, n_sh, shh). Docs with fewer than `n`
    * tokens have no shingles and no signature — they index ONE
    * PRESENCE SENTINEL row (band −1, bk NULL, empty shh; bk NULL can
    * never satisfy the band-key equality, so sentinels generate no
    * candidates) so the refresh's doc_id anti-join sees them: without
    * it, every maintenance tick re-anti-joins and re-checkpoints the
    * same sub-n docs forever (r15 review — the X253/X255 sentinel
    * discipline, applied here).
    */
  private def signatureRows(docs: DataFrame, mode: String, n: Int, nb: Int): DataFrame = {
    val idType = docs.schema("doc_id").dataType
    require(idType == org.apache.spark.sql.types.LongType,
      s"ShingleIndex requires a LONG doc_id (got $idType); assign surrogate " +
        "long ids (TotalOrder.globalIndex) and join back after")
    // the size guard is a cheap split, so the two-way doc split costs
    // two text scans but computes shingles exactly once (an
    // explode_outer single pass was rejected: the xxh kernel would
    // produce DEGENERATE band keys for an empty shingle array — all
    // sub-n docs would bucket together as mutual candidates).
    // NULL text routes into the SENTINEL branch explicitly (r16, the
    // r15 ADVICE): size(split(NULL)) is NULL, which satisfies NEITHER
    // `< n` nor `>= n`, so a NULL-text doc would fall through both
    // branches — no sentinel, no signature — and every refresh would
    // re-anti-join and re-checkpoint it forever, the exact decay the
    // sentinels exist to close (and screenAndRefresh would re-emit it
    // as a "novel" survivor on every replay).
    val sentinels = docs
      .filter(col("text").isNull || size(split(col("text"), " ")) < n)
      .select(lit(0).as("bucket"), lit(-1).as("band"),
        lit(null).cast("long").as("bk"), col("doc_id"),
        lit(0L).as("n_sh"),
        lit(Array.empty[Long]).as("shh"))
    val withSh = docs
      .filter(col("text").isNotNull && size(split(col("text"), " ")) >= n)
      .select(col("doc_id"), Dedup.shingles(col("text"), n).as("sh"))
    val signed = if (mode == Md5Mode) {
      // the q_dedup_minhash_md5 construction verbatim (see Dedup.
      // minhashNearDupsMd5): h = 60-bit md5 prefix, sig mins over
      // h mod P; shh keeps the FULL 60-bit h for the Jaccard verify
      val ex = withSh.select(col("doc_id"), explode(col("sh")).as("s"))
      val h = conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long")
      val hashed = ex.select(col("doc_id"), h.as("h"))
      val sigCols = Dedup.Md5MinhashParams.zipWithIndex.map { case ((a, b), i) =>
        min(((col("h") % P) * a + b) % P).as(s"m$i")
      }
      val agg = hashed.groupBy("doc_id")
        .agg(sigCols.head, (sigCols.tail :+
          sort_array(collect_set(col("h"))).as("shh")): _*)
      val bandCols = (0 until 4).map { k =>
        struct(lit(k).as("band"),
          (col(s"m${2 * k}") * Pack + col(s"m${2 * k + 1}")).as("bk"))
      }
      agg.select(col("doc_id"), size(col("shh")).cast("long").as("n_sh"), col("shh"),
          explode(array(bandCols: _*)).as("bb"))
        .select(
          (col("bb.band") * nb + pmod(col("bb.bk"), lit(nb.toLong))).cast("int").as("bucket"),
          col("bb.band").cast("int").as("band"), col("bb.bk").as("bk"),
          col("doc_id"), col("n_sh"), col("shh"))
    } else {
      // kernel path: signature + band keys in ONE codegen call per row
      // (band index lives in the key's top 16 bits — see
      // Kernels.minhashBandKeys); shh = distinct xxhash64 per shingle
      val (as, bs) = graft.functions.Kernels.minhashParams(XxhNumHashes, 42L)
      val base = withSh.select(col("doc_id"),
        graft.functions.native.minhashBandKeys(col("sh"), as, bs, XxhBands).as("bks"),
        sort_array(array_distinct(transform(col("sh"), s => xxhash64(s)))).as("shh"))
      base.select(col("doc_id"), size(col("shh")).cast("long").as("n_sh"), col("shh"),
          explode(col("bks")).as("bk"))
        .select(
          (shiftright(col("bk"), 48) * nb +
            pmod(col("bk").bitwiseAND(lit(0xffffffffffffL)), lit(nb.toLong)))
            .cast("int").as("bucket"),
          shiftright(col("bk"), 48).cast("int").as("band"), col("bk"),
          col("doc_id"), col("n_sh"), col("shh"))
    }
    signed.unionByName(sentinels)
  }

  /** Build (or rebuild) the index for the catalog `docs`
    * (`doc_id` long, `text`). Returns the index table's committed
    * version. Meta commits FIRST carrying the predicted index version
    * as `stamp`; a crash before the index commit leaves
    * stamp > current, which every reader refuses loudly — a torn
    * rebuild can decay into a refusal, never into a silent screen
    * under mismatched parameters.
    */
  def buildShingleIndex(docs: DataFrame, path: String, n: Int = 3,
                        bucketsPerBand: Int = 64, mode: String = Md5Mode): Long = {
    require(mode == Md5Mode || mode == XxhMode,
      s"mode must be '$Md5Mode' or '$XxhMode', got '$mode'")
    require(n >= 1, s"n must be >= 1, got $n")
    require(bucketsPerBand >= 1, s"bucketsPerBand must be >= 1, got $bucketsPerBand")
    val spark = docs.sparkSession
    import spark.implicits._
    val predicted = Warehouse.currentSnapshot(spark, path) + 1
    val metaRows = Seq((mode, n, bucketsPerBand, bandsOf(mode), predicted))
      .toDF("mode", "n", "nb", "bands", "stamp")
    Warehouse.snapshots(spark, metaPath(path)) match {
      case Seq() => Warehouse.writeSnapshot(metaRows, metaPath(path))
      case vs => Warehouse.commitSnapshot(metaRows, metaPath(path), vs.last)
    }
    val laid = layout(spark, signatureRows(docs, mode, n, bucketsPerBand),
      bandsOf(mode) * bucketsPerBand)
    Warehouse.snapshots(spark, path) match {
      case Seq() => Warehouse.writeSnapshot(laid, path)
      case vs => Warehouse.commitSnapshot(laid, path, vs.last)
    }
  }

  /** Range layout on bucket: contiguous bucket ranges per file is the
    * property that lets manifest min/max stats prune probes at file
    * grain (hash layout would spread every bucket across every file).
    * doc_id tiebreaker keeps the partitioning total for reproducible
    * file boundaries.
    */
  private def layout(spark: SparkSession, rows: DataFrame, totalBuckets: Int): DataFrame = {
    val parts = math.max(1, math.min(totalBuckets,
      spark.sessionState.conf.numShufflePartitions))
    rows.repartitionByRange(parts, col("bucket"), col("doc_id"))
  }

  private def readMeta(spark: SparkSession, path: String): Meta = {
    val side = metaPath(path)
    require(Warehouse.snapshots(spark, side).nonEmpty,
      s"ShingleIndex($path): no meta table — buildShingleIndex first")
    val r = Warehouse.readSnapshot(spark, side)
      .select("mode", "n", "nb", "bands", "stamp").head()
    val meta = Meta(r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4))
    val cur = Warehouse.currentSnapshot(spark, path)
    require(meta.stamp <= cur,
      s"ShingleIndex($path): meta stamp ${meta.stamp} is ahead of the index " +
        s"table (v=$cur) — a rebuild crashed between its meta and index " +
        "commits; re-run buildShingleIndex before probing")
    meta
  }

  /** Sign the incremental `docs` NOT yet indexed under the STORED meta
    * and append — the X200 refresh shape: the tick costs the new docs'
    * bytes (plus one doc_id anti-join against the index at key grain),
    * never a catalog re-shingle. None when nothing is new.
    */
  def refreshShingleIndex(docs: DataFrame, path: String): Option[Long] = {
    val spark = docs.sparkSession
    val meta = readMeta(spark, path)
    // CAS-retried end to end (r16, the r15 verdict: a refresh racing a
    // maintenance/compaction commit failed its micro-batch instead of
    // retrying). The WHOLE body re-runs per conflict — the anti-join's
    // "existing" set included, because the conflicting commit may have
    // been another refresh indexing some of this batch's docs; the
    // anti-join makes the re-derivation idempotent either way.
    Warehouse.retryOnConflict() {
      val existing = Warehouse.readSnapshot(spark, path).select("doc_id").distinct()
      val fresh = docs.select(col("doc_id"), col("text"))
        .join(existing, Seq("doc_id"), "left_anti")
      // gate on the SIGNATURE rows (r15 review): with the presence
      // sentinels, every fresh doc — sub-n included — yields at least
      // one row, so an empty frame here means the batch was truly
      // all-covered and the tick reports None without an empty commit
      val rows = signatureRows(fresh, meta.mode, meta.n, meta.nb)
        .localCheckpoint(true) // consumed by the emptiness probe AND the append
      if (rows.isEmpty) None
      else Some(Warehouse.appendSnapshot(
        layout(spark, rows, meta.bands * meta.nb),
        path, Warehouse.currentSnapshot(spark, path)))
    }
  }

  /** INCREMENTAL near-dup screen against the index — the crawl-cycle
    * question ("near-duplicate of something we already have?") priced
    * at increment bytes + probed buckets: the increment's signatures
    * compute inline, their band keys name the buckets to read, the
    * read opens ONLY those buckets' files (manifest-pruned, the X247
    * shape), candidates come from band-key equality inside the probed
    * rows, and each candidate verifies with exact Jaccard over the
    * stored shingle-hash arrays — the catalog is never re-shingled.
    * Returns (a, b, jaccard): a = indexed doc, b = increment doc,
    * jaccard ≥ threshold. Empty increment → empty result (a streaming
    * micro-batch may legitimately carry nothing).
    *
    * Recall is the banding's, exactly as the inline screens
    * ([[Dedup.minhashNearDupsMd5]]: ≈0.983 per true pair at j=0.8);
    * precision is exact — every candidate is Jaccard-verified. A doc
    * present in BOTH the increment and the index pairs with itself at
    * jaccard 1 — screen before refreshing, the X249 contract.
    */
  def nearDupAgainstShingleIndex(increment: DataFrame, path: String,
                                 threshold: Double = 0.8): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    val spark = increment.sparkSession
    import spark.implicits._
    val meta = readMeta(spark, path)
    // one signature pass over the increment, consumed three times
    // (emptiness, bucket set, candidate join) — checkpoint once
    val probes = signatureRows(increment.select(col("doc_id"), col("text")),
      meta.mode, meta.n, meta.nb).localCheckpoint(true)
    if (probes.isEmpty)
      return spark.emptyDataset[(Long, Long, Double)].toDF("a", "b", "jaccard")
    // the distinct hit-bucket set is bounded by bands × nb — a driver
    // scalar by construction, independent of increment size;
    // contiguous runs collapse into one pruned range read each.
    // SENTINEL rows (band −1, bucket pinned 0) are excluded (r16, the
    // r15 ADVICE): their bk is NULL so they can never join, but
    // including them would widen the pruned read to bucket 0's files
    // on every batch that carries a sub-n doc — pruning decay, not a
    // correctness issue
    val hit = probes.filter(col("band") >= 0)
      .select("bucket").distinct().collect().map(_.getInt(0))
    // an all-sentinel increment (every doc sub-n) probes nothing:
    // no signatures means no candidates, by the same rule
    if (hit.isEmpty)
      return spark.emptyDataset[(Long, Long, Double)].toDF("a", "b", "jaccard")
    val idx = Warehouse.readSnapshotRuns(spark, path, "bucket", hit.toIndexedSeq)
    // band-key equality IS the candidate rule (bucket only lays out
    // files); arrays ride the join and collapse at candidate grain —
    // a pair matching on several bands dedupes in the same aggregate
    // (shh/n_sh are per-doc constants, so first() is deterministic)
    val cand = probes
      .select(col("band"), col("bk"), col("doc_id").as("b"),
        col("n_sh").as("nb"), col("shh").as("shhb"))
      .join(idx.select(col("band"), col("bk"), col("doc_id").as("a"),
        col("n_sh").as("na"), col("shh").as("shha")), Seq("band", "bk"))
      .groupBy(col("a"), col("b"))
      .agg(first(col("na")).as("na"), first(col("nb")).as("nb"),
        first(col("shha")).as("shha"), first(col("shhb")).as("shhb"))
    cand
      .select(col("a"), col("b"),
        size(array_intersect(col("shha"), col("shhb"))).cast("long").as("inter"),
        col("na"), col("nb"))
      .withColumn("jaccard", col("inter") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("a", "b", "jaccard")
  }

  /** THE CRAWL CYCLE in one call — the loop [[nearDupAgainstShingleIndex]]
    * and [[refreshShingleIndex]] exist for, closed (the X249 shape for
    * the shingle family): screen `increment` against the index, DROP
    * every increment doc that near-dups an indexed doc at `threshold`,
    * refresh the index with the SURVIVORS, and return them — so the
    * caller feeds crawl batches in and gets the novel, now-indexed
    * docs out, priced at increment bytes + probed buckets per cycle.
    * Intra-increment near-dups are NOT screened here (both survive and
    * index): that is a separate within-batch pass
    * ([[Dedup.minhashNearDups]] on the increment) when the crawler
    * doesn't already dedup its own batch — screening against the
    * catalog and within the batch are different grains by design.
    * Replay-safe end to end: docs already indexed under their doc_id
    * anti-join out BEFORE the screen (r16 — the r15 ADVICE: a
    * signature-LESS doc — NULL text, sub-n tokens — can never flag
    * against itself, so without the id gate a replayed batch would
    * re-emit it as a "novel, now-indexed" survivor forever), and a
    * replayed signature doc that somehow bypassed the gate still FLAGS
    * as a near-dup of itself at jaccard 1 — the cycle converges
    * instead of double-indexing. The id gate costs one doc_id-grain
    * anti-join against the index — the SAME SHAPE of read the refresh
    * pays again inside its own CAS-retried body (r16 review: two
    * id-column scans per tick, not one shared). Deliberate: the
    * refresh's anti-join re-reads per conflict attempt to exclude a
    * racing writer's docs — handing it this gate's (older) id set
    * would reopen exactly the race retryOnConflict closes. The
    * id-column read is column-pruned and key-grain; at crawl-tick
    * batch sizes the duplicated scan is the price of the race-safety,
    * not an oversight.
    */
  def screenAndRefresh(increment: DataFrame, path: String,
                       threshold: Double = 0.8): DataFrame = {
    val spark = increment.sparkSession
    val indexedIds = Warehouse.readSnapshot(spark, path).select("doc_id").distinct()
    val inc = increment.select(col("doc_id"), col("text"))
      .join(indexedIds, Seq("doc_id"), "left_anti")
    val pairs = nearDupAgainstShingleIndex(inc, path, threshold)
    val survivors = inc
      .join(pairs.select(col("b").as("doc_id")).distinct(), Seq("doc_id"), "left_anti")
      .localCheckpoint(true) // consumed by the refresh AND the caller
    refreshShingleIndex(survivors, path)
    survivors
  }

  /** Zero-data-I/O health advice for this index's bucket layout (r16):
    * [[IndexHealth.bucketIndexAdvice]] over the manifest's per-file
    * bytes + bucket ranges — surfaces re-bucket / re-cluster advice
    * when growth makes probes read too large a fraction of the index.
    * Surfaced, never auto-applied ([[VectorIndex.indexAdvice]]'s
    * discipline).
    */
  def shingleIndexAdvice(spark: SparkSession, path: String,
                         minBytes: Long = 64L << 20,
                         probeFractionBound: Double = 0.25,
                         hotShareBound: Double = 0.25): IndexHealth.BucketIndexAdvice = {
    val meta = readMeta(spark, path)
    IndexHealth.bucketIndexAdvice(spark, path, "bucket", meta.bands * meta.nb,
      minBytes, probeFractionBound, hotShareBound)
  }

  /** Maintenance tick with the bucket clustering FORCED — a plain
    * OPTIMIZE would bin-pack the streaming sink's small append files
    * with no layout, mixing buckets inside every output file and
    * silently killing probe pruning (file min/max would span the
    * domain) — the exact decay [[VectorIndex.maintainIvfIndex]]
    * prevents for cells. The caller's policy applies otherwise;
    * `clusterCols` is overridden, not merged.
    */
  def maintainShingleIndex(spark: SparkSession, path: String,
                           policy: Warehouse.MaintenancePolicy = Warehouse.MaintenancePolicy())
      : Warehouse.MaintenanceReport =
    Warehouse.maintainSnapshot(spark, path,
      policy.copy(clusterCols = Seq("bucket")))

  /** STREAMING index maintenance: each micro-batch of (doc_id, text)
    * rows refreshes the persisted index. Exactly-once WITHOUT an epoch
    * gate, by construction: [[refreshShingleIndex]] anti-joins on
    * doc_id before signing, so a replayed batch's docs are already
    * indexed and the refresh no-ops — the X248 argument verbatim.
    * `maintainEvery` > 0 runs [[maintainShingleIndex]] every N epochs,
    * best-effort (the epoch's refresh already landed; a transient
    * maintenance failure logs and re-fires later).
    */
  def shingleIndexSink(source: DataFrame, path: String, checkpoint: String,
                       maintainEvery: Int = 0,
                       maintainPolicy: Warehouse.MaintenancePolicy =
                         Warehouse.MaintenancePolicy())
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val spark = source.sparkSession
    require(Warehouse.snapshots(spark, metaPath(path)).nonEmpty,
      s"shingleIndexSink($path): no index — buildShingleIndex first (the " +
        "construction is a build decision, not an ingest one)")
    source.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, epoch: Long) =>
        refreshShingleIndex(batch, path)
        if (maintainEvery > 0 && epoch % maintainEvery == maintainEvery - 1)
          try { maintainShingleIndex(batch.sparkSession, path, maintainPolicy); () }
          catch {
            case scala.util.control.NonFatal(e) =>
              System.err.println(s"[graft] shingle-index maintenance at epoch " +
                s"$epoch on $path failed (will retry on a later epoch): ${e.getMessage}")
          }
        ()
      }
  }
}
