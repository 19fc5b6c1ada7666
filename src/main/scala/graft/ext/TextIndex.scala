package graft.ext

import graft.store.Warehouse
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTED LEXICAL (BM25) INDEX (X253, r15) — the X250 move applied
  * to text retrieval: build the corpus's posting lists once, answer
  * every later query batch from a PRUNED bucket read.
  *
  * [[TextAnalysis.bm25TopK]] is self-contained: it tokenizes and
  * scores the WHOLE corpus per call — right for a one-shot ranking
  * job, wrong for the serving/repeated-retrieval loop over a 100 TB
  * corpus, where the postings are identical every call and the scan
  * is the cost. This module materializes the inverted index as
  * warehouse snapshot tables and turns a query batch into:
  *
  *  - the POSTINGS table at `path`: one row per (doc, distinct token)
  *    — `(bucket, token, doc_id, tf, dl)` — range-partitioned on
  *    `bucket = xxhash64(token) mod nb`, so every data file holds a
  *    contiguous bucket range and the manifest's min/max stats (X162)
  *    prune non-probed buckets at FILE grain. ALL postings of one
  *    token live in one bucket, so per-term document frequency is
  *    computed EXACTLY from the probed read — df never goes stale as
  *    the corpus grows, with zero extra state;
  *  - the META table at `path + "_meta"`: one row
  *    `(n_docs, n_dl, sum_dl, nb, stamp)` — the corpus scalars BM25
  *    needs (N = n_docs; avg dl = sum_dl / n_dl, null-length docs
  *    excluded exactly as the inline avg() skips them — all integers
  *    maintained EXACTLY by the refresh, re-derivable from the
  *    postings by [[repairTextIndexMeta]]), plus the
  *    [[ShingleIndex]]-style torn-build stamp: a rebuild that crashes
  *    between its two commits leaves `stamp` ahead of the postings
  *    table, and probes REFUSE loudly instead of scoring new postings
  *    under stale corpus stats.
  *
  * A probe ([[bm25TopKIndexed]]) then costs: one driver-side bucket
  * computation over the query's terms (the same xxhash64 the build
  * used — no scan decides the read set), a manifest-pruned read of
  * ~|distinct term buckets| / nb of the index bytes, and scoring over
  * |terms × df| rows — the corpus text is never touched. The scoring
  * is [[TextAnalysis.bm25TopK]]'s formula verbatim (same idf, same
  * saturation, same 6-dp round), so the indexed probe is
  * score-for-score the inline ranking (spec-pinned, and the oracle
  * key q_bm25_indexed shares q_bm25's DuckDB recomposition — what the
  * key adds is the round-trip THROUGH the persisted postings).
  *
  * INCREMENTAL growth rides the X200 discipline:
  * [[refreshTextIndex]] tokenizes ONLY docs not yet indexed
  * (anti-join on doc_id) and appends their postings; the meta scalars
  * fold the increment's (count, Σdl) exactly — integer algebra, no
  * approximation, no refit. [[textIndexSink]] streams the same
  * refresh exactly-once by the anti-join's idempotence (the X248
  * argument), and [[maintainTextIndex]] bin-packs small append files
  * with the bucket clustering FORCED so compaction never kills probe
  * pruning.
  *
  * 100 TB shape: the index is one corpus tokenization amortized over
  * every later query; a query batch reads probed buckets only (df
  * lists — linear in postings, the same Σdf bound as the inline
  * semi-join, now WITHOUT the corpus scan in front of it).
  */
object TextIndex {

  def metaPath(path: String): String = s"${path}_meta"

  /** The txnApp id every refresh stamps into its postings-append
    * manifest — the detection vehicle for the refresh crash window
    * (r16, the r15 verdict #4): meta's `synced_seq` records the
    * highest stamped postings version whose scalars are folded, and
    * [[Warehouse.lastCommittedEpoch]] recovers the highest stamped
    * version actually COMMITTED, zero data I/O. Postings ahead of
    * meta → a probe refuses loudly naming [[repairTextIndexMeta]]
    * (after a short grace wait, since a LIVE refresh is between its
    * two commits for a moment on every tick).
    */
  private val RefreshApp = "graft-text-index-refresh"

  /** The txn app each META FOLD stamps — epoch = the postings version
    * whose scalars that fold covers (r16 review). Pairs with
    * [[RefreshApp]] into the per-version window check in `readMeta`,
    * makes the fold idempotent per version (a fold whose version a
    * racing [[repairTextIndexMeta]] already covered SKIPS instead of
    * double-counting), and lets folds advance the `synced_seq` pin
    * across contiguously-covered stamps so the stamp sets stay small
    * and retention can never orphan the protocol.
    */
  private val FoldApp = "graft-text-meta-fold"

  /** Driver-side twin of the build's bucket expression — MUST match
    * `pmod(xxhash64(token), nb)` (Spark's xxhash64, seed 42). */
  private def bucketOf(token: String, nb: Int): Int =
    math.floorMod(
      org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String(
        org.apache.spark.unsafe.types.UTF8String.fromString(token), 42L),
      nb.toLong).toInt

  /** One row per (doc, distinct token) — plus a PRESENCE SENTINEL
    * (token NULL, tf 0, bucket pinned to 0) for a doc that yields no
    * postings (NULL text), so EVERY doc is visible to the refresh's doc_id
    * anti-join: without it, a posting-less doc reads as "fresh" on
    * every refresh/replay and re-folds into the corpus scalars forever
    * (r15 review). Probes filter `token IN (…)`, which drops NULLs, so
    * sentinels never score; and with every doc carrying ≥1 row, the
    * meta scalars are exactly re-derivable from the postings alone
    * ([[repairTextIndexMeta]]).
    */
  private def postingRows(docs: DataFrame, nb: Int): DataFrame =
    docs.select(col("doc_id"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("dl"),
        explode_outer(graft.functions.native.tokenCounts(col("text"))).as("tc"))
      .select(
        // sentinel bucket pinned to 0 EXPLICITLY (r15 review):
        // xxhash64(NULL) returns the seed, not NULL, so a coalesce
        // fallback would never fire and sentinels would land in
        // bucket seed-mod-nb — harmless to probes (the token IN
        // filter drops them) but a lie to anyone reasoning about
        // where sentinels live
        when(col("tc.token").isNull, lit(0))
          .otherwise(pmod(xxhash64(col("tc.token")), lit(nb.toLong)).cast("int"))
          .as("bucket"),
        col("tc.token").as("token"), col("doc_id"),
        coalesce(col("tc.tf").cast("long"), lit(0L)).as("tf"), col("dl"))

  private def layout(spark: SparkSession, rows: DataFrame, nb: Int): DataFrame = {
    val parts = math.max(1, math.min(nb,
      spark.sessionState.conf.numShufflePartitions))
    rows.repartitionByRange(parts, col("bucket"), col("token"), col("doc_id"))
  }

  /** Build (or rebuild) the index for `docs` (`doc_id` long, `text`).
    * Returns the postings table's committed version. Same commit
    * protocol as [[ShingleIndex.buildShingleIndex]]: meta first,
    * stamped with the predicted postings version — a torn rebuild
    * refuses loudly at every later probe.
    */
  def buildTextIndex(docs: DataFrame, path: String, bucketCount: Int = 64): Long = {
    require(bucketCount >= 1, s"bucketCount must be >= 1, got $bucketCount")
    val spark = docs.sparkSession
    import spark.implicits._
    // Corpus scalars from one NARROW doc-grain pass (r16 — this was an
    // eager localCheckpoint of the full exploded posting frame so the
    // scalars and the layout write could share one tokenization; the
    // checkpoint was the single most expensive job of every indexed
    // retrieval key at sf0.1 — 0.6-0.85 s of q_rrf_pq's warm profile —
    // and at scale it materializes postings ≫ corpus bytes. The
    // scalars only need (doc_id, dl): tokenizing twice costs two cheap
    // kernel scans of the corpus, strictly less than materializing and
    // re-reading the explode. The r15 single-pass review compared
    // against re-deriving the scalars from a second POSTING explode —
    // this pass never explodes). Same doc-grain derivation as
    // [[repairTextIndexMeta]]: n_docs counts every doc (the idf's N);
    // n_dl/sum_dl count only docs with a non-NULL length, matching the
    // inline avg()'s null-skipping; the groupBy keeps dup-doc_id
    // inputs counted at doc grain exactly as the posting-derived form.
    val s = docs
      .select(col("doc_id"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("dl"))
      .groupBy("doc_id").agg(first(col("dl")).as("dl"))
      .agg(count(lit(1)).as("n"), count(col("dl")).as("ndl"),
        sum(col("dl")).as("sdl")).head()
    val (nDocs, nDl, sumDl) =
      (s.getLong(0), s.getLong(1), if (s.isNullAt(2)) 0L else s.getLong(2))
    val predicted = Warehouse.currentSnapshot(spark, path) + 1
    // a REBUILD inherits prior refresh stamps in the retained history:
    // record them as already-synced (the rebuild's scalars cover the
    // whole corpus by construction)
    val synced = Warehouse.lastCommittedEpoch(spark, path, RefreshApp).getOrElse(0L)
    val metaRows = Seq((nDocs, nDl, sumDl, bucketCount, predicted, synced))
      .toDF("n_docs", "n_dl", "sum_dl", "nb", "stamp", "synced_seq")
    Warehouse.snapshots(spark, metaPath(path)) match {
      case Seq() => Warehouse.writeSnapshot(metaRows, metaPath(path))
      case vs => Warehouse.commitSnapshot(metaRows, metaPath(path), vs.last)
    }
    val laid = layout(spark, postingRows(docs, bucketCount), bucketCount)
    Warehouse.snapshots(spark, path) match {
      case Seq() => Warehouse.writeSnapshot(laid, path)
      case vs => Warehouse.commitSnapshot(laid, path, vs.last)
    }
  }

  private case class Meta(nDocs: Long, nDl: Long, sumDl: Long, nb: Int,
                          stamp: Long, syncedSeq: Long)

  private def readMetaRow(spark: SparkSession, path: String): Meta = {
    val side = metaPath(path)
    require(Warehouse.snapshots(spark, side).nonEmpty,
      s"TextIndex($path): no meta table — buildTextIndex first")
    val r = Warehouse.readSnapshot(spark, side)
      .select("n_docs", "n_dl", "sum_dl", "nb", "stamp", "synced_seq").head()
    val meta = Meta(r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3),
      r.getLong(4), r.getLong(5))
    val cur = Warehouse.currentSnapshot(spark, path)
    require(meta.stamp <= cur,
      s"TextIndex($path): meta stamp ${meta.stamp} is ahead of the postings " +
        s"table (v=$cur) — a rebuild crashed between its meta and postings " +
        "commits; re-run buildTextIndex before probing")
    meta
  }

  /** Probe-grade meta read: the torn-BUILD stamp check, plus the
    * refresh-window check (r16, the r15 verdict #4 — previously
    * nothing DETECTED the window; the owner had to suspect it): if the
    * postings table carries a stamped refresh commit whose scalars
    * never folded (`lastCommittedEpoch` > `synced_seq`), the probe
    * REFUSES loudly naming the repair — after a short grace wait,
    * because every live refresh sits between its two commits for a
    * moment and a serving probe racing that moment should wait it out,
    * not crash. The grace is bounded: a CRASHED refresh never
    * resolves, so detection stays loud.
    */
  private def readMeta(spark: SparkSession, path: String): Meta = {
    var meta = readMetaRow(spark, path)
    // PER-VERSION window detection (r16 review): a max-only comparison
    // (newest postings stamp vs a max-folded synced_seq) is masked the
    // moment a LATER refresh lands and folds — a crashed middle
    // refresh's stamp then sits below the newest forever, its scalars
    // silently missing, the exact failure the detection exists to
    // close. So each fold stamps the postings version it covers into
    // the META manifest ([[FoldApp]]), `synced_seq` is a covering PIN
    // (every stamped version <= it is folded — set by build/repair,
    // advanced by folds only across contiguously-covered stamps), and
    // the window check compares the two stamp SETS: any stamped
    // postings version above the pin without a matching fold stamp is
    // an open window, however many refreshes landed after it.
    def lag(): Set[Long] = {
      val stamped = Warehouse.committedEpochs(spark, path, RefreshApp)
      val folded = Warehouse.committedEpochs(spark, metaPath(path), FoldApp)
      stamped.filter(v => v > meta.syncedSeq && !folded(v))
    }
    // the grace budget bounds how long a probe waits out a LIVE
    // refresh's inter-commit moment before declaring the window
    // crashed; generous by default (a slow scalar agg on a cold
    // executor is not a crash), overridable for tests that WANT the
    // refusal fast
    val graceMs = spark.conf.getOption("graft.textindex.syncGraceMs")
      .map(_.toLong).getOrElse(15000L)
    val stepMs = 150L
    var waited = 0L
    while (lag().nonEmpty && waited < graceMs) {
      Thread.sleep(stepMs); meta = readMetaRow(spark, path); waited += stepMs
    }
    val missing = lag()
    if (missing.nonEmpty)
      throw new IllegalArgumentException(
        s"TextIndex($path): postings v=${missing.toSeq.sorted.mkString(",")} " +
          s"landed but their corpus scalars never folded (pin " +
          s"synced_seq=${meta.syncedSeq}) — a refresh crashed between its " +
          "postings append and meta commit; run repairTextIndexMeta to " +
          "re-derive the scalars exactly")
    meta
  }

  /** Tokenize and append ONLY docs not yet indexed, folding their
    * (count, Σdl) into the meta scalars exactly — the X200 refresh:
    * the tick costs the new docs' bytes, never a corpus re-tokenize.
    * None when nothing is new.
    *
    * Crash-window DETECTION (r16, the r15 verdict #4): the postings
    * append stamps `(RefreshApp, appended version)` into its manifest;
    * the meta fold records that version as `synced_seq`. A crash
    * between the two commits leaves the stamp ahead of `synced_seq`,
    * which every later probe/refresh detects and refuses loudly
    * naming [[repairTextIndexMeta]] — the scalars can no longer go
    * PERMANENTLY missing an increment's share without anyone knowing
    * (postings and df stay exact throughout; df derives from the
    * probed postings themselves).
    *
    * Both commits are CAS-retried (r16, the r15 verdict #3): the
    * append re-runs its anti-join per conflict (a racing refresh's
    * docs re-exclude; a racing maintenance tick changes nothing the
    * anti-join reads), and the meta fold is a read-modify-write that
    * re-reads the CURRENT scalars per attempt — `synced_seq` folds
    * with max() so two racing refreshes' folds land in either order.
    */
  def refreshTextIndex(docs: DataFrame, path: String): Option[Long] = {
    val spark = docs.sparkSession
    val meta = readMeta(spark, path)
    val appended = Warehouse.retryOnConflict() {
      val existing = Warehouse.readSnapshot(spark, path).select("doc_id").distinct()
      val fresh = docs.select(col("doc_id"), col("text"))
        .join(existing, Seq("doc_id"), "left_anti")
        .localCheckpoint(true) // consumed by the emptiness probe, the append AND the stats fold
      if (fresh.isEmpty) None
      else {
        val base = Warehouse.currentSnapshot(spark, path)
        val v = Warehouse.appendSnapshot(
          layout(spark, postingRows(fresh, meta.nb), meta.nb),
          path, base, txn = Some((RefreshApp, base + 1)))
        Some((v, fresh))
      }
    }
    appended.map { case (v, fresh) =>
      val dlExpr = size(TextAnalysis.tokens(col("text"))).cast("long")
      val s = fresh.agg(count(lit(1)).as("n"), count(dlExpr).as("ndl"),
        sum(dlExpr).as("sdl")).head()
      val (dn, dndl, dsl) =
        (s.getLong(0), s.getLong(1), if (s.isNullAt(2)) 0L else s.getLong(2))
      import spark.implicits._
      val side = metaPath(path)
      Warehouse.retryOnConflict() {
        val curSide = Warehouse.currentSnapshot(spark, side)
        val m = Warehouse.readSnapshot(spark, side, Some(curSide))
          .select("n_docs", "n_dl", "sum_dl", "nb", "stamp", "synced_seq").head()
        val pin = m.getLong(5)
        val folded = Warehouse.committedEpochs(spark, side, FoldApp)
        // idempotent per version (r16 review): if a racing
        // repairTextIndexMeta already pinned past v (its re-derivation
        // read v's postings), or this fold's own stamp landed on an
        // earlier attempt, adding the delta again would double-count
        if (v <= pin || folded(v)) curSide
        else {
          // advance the pin across contiguously-covered stamps: the
          // largest stamped version below which every stamp is folded
          // — keeps the stamp sets the window check compares small,
          // and retention-proof (a trimmed fold stamp below the pin
          // no longer matters)
          val stamped = Warehouse.committedEpochs(spark, path, RefreshApp)
          val covered = folded + v
          val newPin = stamped.filter(_ > pin).toSeq.sorted
            .iterator.takeWhile(covered).foldLeft(pin)((_, s) => s)
          Warehouse.commitSnapshot(
            Seq((m.getLong(0) + dn, m.getLong(1) + dndl, m.getLong(2) + dsl,
              m.getInt(3), m.getLong(4), newPin))
              .toDF("n_docs", "n_dl", "sum_dl", "nb", "stamp", "synced_seq"),
            side, curSide, txn = Some((FoldApp, v)))
        }
      }
      v
    }
  }

  /** Re-derive the meta scalars EXACTLY from the postings table (one
    * index-grain scan, doc-grain aggregate) and commit them — the
    * repair for a refresh that crashed between its postings append and
    * its meta commit (which every later probe now detects and names
    * this repair for — r16). Exact because every doc carries ≥1
    * posting row (the presence sentinel) and each row carries the
    * doc's dl; `synced_seq` re-pins to the highest stamped postings
    * commit, closing the window. Returns the new meta version.
    */
  def repairTextIndexMeta(spark: SparkSession, path: String): Long = {
    val meta = readMetaRow(spark, path) // NOT the probe-grade read: the
    // window this repairs would make readMeta refuse
    val perDoc = Warehouse.readSnapshot(spark, path)
      .groupBy("doc_id").agg(first(col("dl")).as("dl"))
      .agg(count(lit(1)).as("n"), count(col("dl")).as("ndl"),
        sum(col("dl")).as("sdl")).head()
    val (n, ndl, sdl) = (perDoc.getLong(0), perDoc.getLong(1),
      if (perDoc.isNullAt(2)) 0L else perDoc.getLong(2))
    val synced = Warehouse.lastCommittedEpoch(spark, path, RefreshApp)
      .getOrElse(0L)
    import spark.implicits._
    val side = metaPath(path)
    Warehouse.retryOnConflict() {
      Warehouse.commitSnapshot(
        Seq((n, ndl, sdl, meta.nb, meta.stamp, math.max(meta.syncedSeq, synced)))
          .toDF("n_docs", "n_dl", "sum_dl", "nb", "stamp", "synced_seq"),
        side, Warehouse.currentSnapshot(spark, side))
    }
  }

  /** BM25 top-k THROUGH the index: the [[TextAnalysis.bm25TopK]]
    * ranking with the corpus scan replaced by a driver-planned pruned
    * read — the query terms' buckets are computed driver-side (the
    * build's own hash), the read opens only those buckets' files, df
    * per term is exact from the probed postings, and the scoring
    * formula/rounding is the inline ranking's verbatim.
    *
    * `allowed` (r16) is FILTERED retrieval: a one-column (`doc_id`)
    * frame semi-joined into the CANDIDATES before the rank cut —
    * "top-k among these docs", with the collection statistics (df,
    * n_docs, avg_dl) staying GLOBAL, the standard search-engine
    * contract (a filter restricts candidates; it does not define a
    * new corpus, so scores are comparable across filters and the
    * meta scalars stay one bounded read). Docs outside the set never
    * occupy rank slots — short lists over silent fallback. At scale
    * the semi-join's left side is already bounded by the probed
    * buckets' postings; the allow set arrives as the caller built it
    * (a stats-pruned id scan, a committed id list) — broadcast-hint
    * it when it is small.
    */
  def bm25TopKIndexed(spark: SparkSession, path: String,
                      queries: Seq[(Int, Seq[String])], k: Int,
                      k1: Double = 1.2, b: Double = 0.75,
                      allowed: Option[DataFrame] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(queries.nonEmpty && k >= 1)
    val meta = readMeta(spark, path)
    import spark.implicits._
    val qterms = queries
      .flatMap { case (qid, ts) => ts.map(t => (qid, t.toLowerCase)) }
      .toDF("query_id", "token")
    val terms = queries.flatMap(_._2.map(_.toLowerCase)).distinct
    // all-empty term lists: the inline ranking returns empty, so must
    // the indexed probe (r15 review — the runs read would otherwise
    // refuse its empty id set)
    if (terms.isEmpty)
      return spark.emptyDataset[(Int, Int, Long, Double)]
        .toDF("query_id", "rank", "doc_id", "bm25")
    // driver-planned read set: the terms' buckets, no scan decides it.
    // Consumed twice (dfreq + the scoring join) WITHOUT a checkpoint:
    // unlike the inline bm25TopK — whose double-consumed subtree is
    // the corpus tokenization — this subtree is already the pruned
    // bucket read, so re-scanning probed buckets costs less than an
    // eager materialization job, and the plan keeps its file lineage
    // (the probed-files poison pin reads it)
    val hit = terms.map(t => bucketOf(t, meta.nb)).distinct
    val idx = Warehouse.readSnapshotRuns(spark, path, "bucket", hit)
      .filter(col("token").isin(terms: _*))
      .select(col("token"), col("doc_id"),
        col("tf").cast("double").as("tf"), col("dl").cast("double").as("dl"))
    val dfreq = idx.groupBy("token").agg(count(lit(1)).cast("double").as("df_t"))
    val nDocs = meta.nDocs.toDouble
    // avg over docs WITH a length, the inline avg()'s null-skipping
    val avgDl = if (meta.nDl > 0) meta.sumDl.toDouble / meta.nDl.toDouble else 0.0
    // df above comes from the UNFILTERED probed postings — global
    // stats; the allow set only prunes candidates below
    val cand = allowed.fold(idx)(a =>
      idx.join(a.select(col("doc_id")), Seq("doc_id"), "left_semi"))
    cand.join(broadcast(qterms), Seq("token"))
      .join(broadcast(dfreq), Seq("token"))
      .withColumn("contrib",
        log(lit(1.0) + (lit(nDocs) - col("df_t") + 0.5) / (col("df_t") + 0.5)) *
          (col("tf") * (k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / lit(avgDl))))
      .groupBy("query_id", "doc_id").agg(round(sum("contrib"), 6).as("bm25"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(desc("bm25"), asc("doc_id"))))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "doc_id", "bm25")
  }

  /** Zero-data-I/O health advice for the token-bucket layout (r16):
    * [[IndexHealth.bucketIndexAdvice]] over the manifest alone —
    * re-bucket / re-cluster advice as the corpus outgrows the
    * build-time `nb`. Reads the meta row WITHOUT the window check
    * (advice must stay available while a crashed refresh awaits its
    * repair).
    */
  def textIndexAdvice(spark: SparkSession, path: String,
                      minBytes: Long = 64L << 20,
                      probeFractionBound: Double = 0.25,
                      hotShareBound: Double = 0.25): IndexHealth.BucketIndexAdvice = {
    val meta = readMetaRow(spark, path)
    IndexHealth.bucketIndexAdvice(spark, path, "bucket", meta.nb,
      minBytes, probeFractionBound, hotShareBound)
  }

  /** Maintenance tick with the bucket clustering FORCED — the
    * [[ShingleIndex.maintainShingleIndex]] rationale verbatim: a
    * layout-less OPTIMIZE would mix buckets inside every output file
    * and silently kill probe pruning.
    */
  def maintainTextIndex(spark: SparkSession, path: String,
                        policy: Warehouse.MaintenancePolicy = Warehouse.MaintenancePolicy())
      : Warehouse.MaintenanceReport =
    Warehouse.maintainSnapshot(spark, path,
      policy.copy(clusterCols = Seq("bucket")))

  /** STREAMING index maintenance: each micro-batch of (doc_id, text)
    * rows refreshes the index — exactly-once by [[refreshTextIndex]]'s
    * anti-join (the X248 argument); `maintainEvery` epochs run the
    * layout-preserving tick, best-effort.
    */
  def textIndexSink(source: DataFrame, path: String, checkpoint: String,
                    maintainEvery: Int = 0,
                    maintainPolicy: Warehouse.MaintenancePolicy =
                      Warehouse.MaintenancePolicy())
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val spark = source.sparkSession
    require(Warehouse.snapshots(spark, metaPath(path)).nonEmpty,
      s"textIndexSink($path): no index — buildTextIndex first")
    source.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, epoch: Long) =>
        refreshTextIndex(batch, path)
        if (maintainEvery > 0 && epoch % maintainEvery == maintainEvery - 1)
          try { maintainTextIndex(batch.sparkSession, path, maintainPolicy); () }
          catch {
            case scala.util.control.NonFatal(e) =>
              System.err.println(s"[graft] text-index maintenance at epoch " +
                s"$epoch on $path failed (will retry on a later epoch): ${e.getMessage}")
          }
        ()
      }
  }
}
