package graft.ext

import graft.store.Warehouse
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** PERSISTED IVF vector index (X247, r14) — build once, probe forever.
  *
  * Every ANN entry point in [[Similarity]] is self-contained: it fits
  * coarse centroids and assigns the corpus per CALL, which is the
  * right shape for one-shot jobs and the wrong one for a serving /
  * repeated-retrieval workload over a 100 TB embedding corpus — the
  * fit is a corpus scan and the assignment another, paid on every
  * query batch. This module materializes the IVF structure as
  * warehouse snapshot tables and turns a probe into a PRUNED READ:
  *
  *  - the INDEX table at `path`: `(vec_id, embedding, cell)`,
  *    range-partitioned on `cell` at build, so every data file holds a
  *    contiguous cell range and the manifest's per-file min/max stats
  *    (X162) prune non-probed cells at the FILE level — a probe of
  *    `nprobe` cells opens ~`nprobe/nlist` of the corpus bytes and
  *    plans driver-side with zero I/O for skipped files;
  *  - the CENTROIDS table at `path + "_centroids"`:
  *    `(cell, centroid, mode)` — `nlist` rows, read and collected at
  *    probe time (bounded: nlist × dim doubles, the same driver-scalar
  *    budget the inline fit already used).
  *
  * Both tables get full snapshot semantics for free: versioned commits,
  * time travel, retention, OPTIMIZE, and the maintenance tick.
  *
  * INCREMENTAL growth rides the X200 refresh discipline:
  * [[refreshIvfIndex]] assigns ONLY vectors not yet in the index
  * (anti-join on `vec_id`) against the STORED centroids and appends —
  * the steady-state tick costs the new vectors' bytes, never a refit.
  * Centroids staying fixed means recall decays as the distribution
  * drifts (the standard IVF trade); re-seeding is an explicit
  * [[buildIvfIndex]] decision, exactly like the bloom index's
  * `indexSnapshot` full rebuild.
  *
  * `bucketed = true` swaps the k-means assignment for the X220
  * engine-portable rule (`cell = vec_id mod nlist`, probes = the
  * nprobe cells starting at the query's own bucket) — same plan
  * shape, ANSI-recomposable end-to-end, so the PERSISTED probe path
  * itself carries a DuckDB oracle (q_ann_ivf_indexed); the k-means
  * mode stays the production semantic index.
  */
object VectorIndex {

  private val KmeansMode = "kmeans"
  private val BucketedMode = "bucketed"

  def centroidsPath(path: String): String = s"${path}_centroids"

  /** Build (or rebuild) the index for `corpus` (`vec_id`, `embedding`).
    * Returns the index table's committed version.
    */
  def buildIvfIndex(corpus: DataFrame, path: String, nlist: Int = 16,
                    fitSample: Int = 50, bucketed: Boolean = false): Long = {
    require(nlist >= 1, s"nlist must be >= 1, got $nlist")
    val spark = corpus.sparkSession
    import spark.implicits._
    val (assigned, centRows) =
      if (bucketed) {
        val a = corpus.select(col("vec_id"), col("embedding"),
          pmod(col("vec_id"), lit(nlist)).cast("int").as("cell"))
        val c = (0 until nlist).map(i => (i, Seq.empty[Double], BucketedMode))
          .toDF("cell", "centroid", "mode")
        (a, c)
      } else {
        val cents = Similarity.coarseCentroids(corpus, nlist, fitSample)
        val assign1 = graft.functions.native.centroidProbes(col("embedding"), cents, 1)
        val a = corpus.select(col("vec_id"), col("embedding"),
          element_at(assign1, 1).as("cell"))
        val c = cents.zipWithIndex
          .map { case (v, i) => (i, v.toSeq, KmeansMode) }
          .toSeq.toDF("cell", "centroid", "mode")
        (a, c)
      }
    // range partitioning on cell gives each data file a CONTIGUOUS
    // cell range — the property that makes the manifest min/max stats
    // prune probes at file grain (hash partitioning would spread every
    // cell across every file and kill skipping). vec_id as tiebreaker
    // keeps the sort total for reproducible file layout.
    val parts = math.max(1, math.min(nlist,
      spark.sessionState.conf.numShufflePartitions))
    val laid = assigned.repartitionByRange(parts, col("cell"), col("vec_id"))
    Warehouse.snapshots(spark, centroidsPath(path)) match {
      case Seq() => Warehouse.writeSnapshot(centRows, centroidsPath(path))
      case vs => Warehouse.commitSnapshot(centRows, centroidsPath(path), vs.last)
    }
    Warehouse.snapshots(spark, path) match {
      case Seq() => Warehouse.writeSnapshot(laid, path)
      case vs => Warehouse.commitSnapshot(laid, path, vs.last)
    }
  }

  /** The stored centroids, cell-ordered, plus the index mode. */
  private def readCentroids(spark: SparkSession, path: String)
      : (Array[Array[Double]], String, Int) = {
    val side = centroidsPath(path)
    require(Warehouse.snapshots(spark, side).nonEmpty,
      s"VectorIndex($path): no centroids table — buildIvfIndex first")
    val rows = Warehouse.readSnapshot(spark, side)
      .select("cell", "centroid", "mode").collect()
      .sortBy(_.getInt(0))
    require(rows.nonEmpty, s"VectorIndex($path): centroids table is empty")
    val mode = rows.head.getString(2)
    (rows.map(_.getSeq[Double](1).toArray), mode, rows.length)
  }

  /** Assign the incremental `corpus` rows NOT yet indexed to the
    * STORED structure and append them — the X200 refresh shape: the
    * tick costs the new vectors' bytes (plus one vec_id anti-join
    * against the index at key grain), never a refit or corpus rescan.
    * None when nothing is new.
    */
  def refreshIvfIndex(corpus: DataFrame, path: String): Option[Long] = {
    val spark = corpus.sparkSession
    val (cents, mode, nlist) = readCentroids(spark, path)
    val existing = Warehouse.readSnapshot(spark, path).select("vec_id")
    val fresh = corpus.select(col("vec_id"), col("embedding"))
      .join(existing, Seq("vec_id"), "left_anti")
      .localCheckpoint(true) // consumed by the emptiness probe AND the append
    if (fresh.isEmpty) return None
    val assigned =
      if (mode == BucketedMode)
        fresh.select(col("vec_id"), col("embedding"),
          pmod(col("vec_id"), lit(nlist)).cast("int").as("cell"))
      else {
        val assign1 = graft.functions.native.centroidProbes(col("embedding"), cents, 1)
        fresh.select(col("vec_id"), col("embedding"),
          element_at(assign1, 1).as("cell"))
      }
    val parts = math.max(1, math.min(nlist,
      spark.sessionState.conf.numShufflePartitions))
    Some(Warehouse.appendSnapshot(
      assigned.repartitionByRange(parts, col("cell"), col("vec_id")),
      path, Warehouse.currentSnapshot(spark, path)))
  }

  /** INCREMENTAL near-dup screen against the index (X249) — the
    * embedding-space analog of the X91 incremental exact dedup: an
    * increment of (vec_id, embedding) rows is checked against the
    * INDEXED corpus without ever scanning it — probe the increment's
    * vectors through the pruned cell read, exact-cosine against the
    * probed cells only, and flag rows whose best indexed neighbor
    * reaches `threshold`. Returns the increment plus
    * (`dup_of`, `dup_sim`) — NULL when the row is novel — so the
    * caller routes novel rows to [[refreshIvfIndex]] (or the
    * streaming sink) and drops/links the near-dups: the
    * dedup-then-index loop of a growing corpus, priced at the
    * increment's bytes + the probed cells. Approximate exactly as IVF
    * retrieval is (a near-dup hiding in an unprobed cell is missed —
    * raise `nprobe` for recall); rows already indexed under the same
    * vec_id match THEMSELVES at sim 1 — screen before refresh, or
    * anti-join first as [[refreshIvfIndex]] does.
    */
  def nearDupAgainstIndex(increment: DataFrame, path: String,
                          threshold: Double = 0.95,
                          nprobe: Int = 4): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    val best = ivfTopKIndexed(increment, path, k = 1, nprobe = nprobe)
      .filter(col("sim") >= threshold)
      .select(col("query_id").as("vec_id"), col("neighbor_id").as("dup_of"),
        col("sim").as("dup_sim"))
    increment.join(best, Seq("vec_id"), "left")
  }

  /** Maintenance tick for the index table — [[Warehouse.maintainSnapshot]]
    * with the cell clustering FORCED (r14): a plain OPTIMIZE would
    * bin-pack the streaming sink's small append files with no layout,
    * mixing cells inside every output file — each file's cell min/max
    * then spans the domain and probe pruning silently dies, the exact
    * decay this wrapper exists to prevent. The caller's policy applies
    * otherwise (analyze columns, retention, dv purge); `clusterCols`
    * is overridden, not merged — the index has exactly one layout key.
    * Known decay edge, correct-by-stats either way: a DV PURGE inside
    * the tick (vectors erased via deleteWhereDv crossing the policy
    * threshold) rewrites the touched files WITHOUT the cell sort, so
    * those files' cell ranges widen and their pruning decays until a
    * later tick's clustered OPTIMIZE re-packs them — reads stay exact
    * throughout (file stats remain valid bounds; pruning is never a
    * correctness gate).
    */
  def maintainIvfIndex(spark: SparkSession, path: String,
                       policy: Warehouse.MaintenancePolicy = Warehouse.MaintenancePolicy())
      : Warehouse.MaintenanceReport =
    Warehouse.maintainSnapshot(spark, path,
      policy.copy(clusterCols = Seq("cell")))

  /** STREAMING index maintenance (X248): each micro-batch of
    * (vec_id, embedding) rows refreshes the persisted index — the
    * embedding-ingest half of a retrieval pipeline as one sink. The
    * index must exist ([[buildIvfIndex]] seeds centroids + layout;
    * which rule the index follows is a build decision, not an ingest
    * one). Exactly-once WITHOUT an epoch gate, by construction:
    * [[refreshIvfIndex]] anti-joins on `vec_id` before assigning, so
    * a replayed batch's vectors are already indexed and the refresh
    * no-ops — idempotence is the operator's own semantics, the same
    * argument as the X91 incremental-dedup sink. (An epoch gate would
    * add nothing: the anti-join IS the dedup.)
    *
    * `maintainEvery` (r14, the X241 composition): every N epochs the
    * sink runs [[maintainIvfIndex]] — cell-clustered OPTIMIZE, so the
    * per-epoch small append files re-pack WITHOUT losing probe
    * pruning — best-effort (the epoch's refresh already landed; a
    * transient maintenance failure logs and re-fires later).
    */
  def vectorIndexSink(source: DataFrame, path: String, checkpoint: String,
                      maintainEvery: Int = 0,
                      maintainPolicy: Warehouse.MaintenancePolicy =
                        Warehouse.MaintenancePolicy())
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val spark = source.sparkSession
    require(Warehouse.snapshots(spark, centroidsPath(path)).nonEmpty,
      s"vectorIndexSink($path): no index — buildIvfIndex first (the cell rule " +
        "is a build decision, not an ingest one)")
    source.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, epoch: Long) =>
        refreshIvfIndex(batch, path)
        if (maintainEvery > 0 && epoch % maintainEvery == maintainEvery - 1)
          try { maintainIvfIndex(batch.sparkSession, path, maintainPolicy); () }
          catch {
            case scala.util.control.NonFatal(e) =>
              System.err.println(s"[graft] vector-index maintenance at epoch " +
                s"$epoch on $path failed (will retry on a later epoch): ${e.getMessage}")
          }
        ()
      }
  }

  /** Probe the persisted index: per query the `nprobe` nearest cells
    * (stored-centroid distance in kmeans mode; the X220 rule in
    * bucketed mode), a PRUNED read of exactly the probed cells' files,
    * exact-cosine rerank, per-query top-k — [[Similarity.ivfTopK]]'s
    * plan shape with the fit and assignment scans replaced by a
    * bounded centroid read and manifest-planned file skipping.
    */
  def ivfTopKIndexed(queries: DataFrame, path: String, k: Int = 10,
                     nprobe: Int = 4): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = queries.sparkSession
    val (cents, mode, nlist) = readCentroids(spark, path)
    val np = math.min(nprobe, nlist)
    val probes =
      if (mode == BucketedMode)
        queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"),
            Similarity.l2norm(col("embedding")).as("qn"),
            explode(sequence(lit(0), lit(np - 1))).as("i"))
          .select(col("query_id"), col("qv"), col("qn"),
            pmod(col("query_id") + col("i"), lit(nlist)).cast("int").as("cell"))
      else
        queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"),
          Similarity.l2norm(col("embedding")).as("qn"),
          explode(graft.functions.native.centroidProbes(col("embedding"), cents, np))
            .as("cell"))
    // the distinct probed-cell set is bounded by nlist (a driver
    // scalar by the same budget as the centroid read); contiguous
    // runs collapse into one pruned range read each, so the file
    // planning stays one manifest pass per run
    val cellsHit = probes.select("cell").distinct()
      .collect().map(_.getInt(0)).sorted
    require(cellsHit.nonEmpty, "ivfTopKIndexed: no probe cells (empty query frame?)")
    val runs = cellsHit.foldLeft(List.empty[(Int, Int)]) {
      case ((lo, hi) :: rest, c) if c == hi + 1 => (lo, c) :: rest
      case (acc, c) => (c, c) :: acc
    }.reverse
    val corpusIdx = runs.map { case (lo, hi) =>
      Warehouse.readSnapshotRange(spark, path, "cell", Some(lo), Some(hi))
    }.reduce(_ unionByName _)
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"), col("cell"))
    val scored = broadcast(probes).join(corpusIdx, Seq("cell"))
      .select(col("query_id"), col("neighbor_id"),
        (Similarity.dot(col("qv"), col("cv"))
          / (col("qn") * Similarity.l2norm(col("cv")))).as("sim"))
    val w = Window.partitionBy("query_id").orderBy(desc("sim"), asc("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "sim")
  }
}
