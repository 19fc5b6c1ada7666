package graft.ext

import graft.store.Warehouse
import org.apache.spark.sql.SparkSession

/** BUCKET-INDEX HEALTH ADVICE (r16, the r15 verdict #5) — the
  * [[VectorIndex.indexAdvice]] pattern applied to the hash-bucketed
  * index family (shingle-LSH buckets, BM25 token buckets, posting
  * buckets): `nb` is fixed at build, and as the corpus grows 100×
  * nothing signals when a probe's hit buckets stop being a small
  * fraction of the index — probes silently decay toward full scans.
  * This module reads NOTHING but the committed manifest (per-file
  * bytes + per-file min/max of the bucket column — the same stats the
  * pruning itself plans with), and SURFACES a rebuild/re-layout
  * recommendation; applying it is the owner's scheduling decision,
  * the joinAdvice discipline.
  *
  * Two decaying states, two signals:
  *  - PROBE-FRACTION decay: the expected fraction of index bytes a
  *    single-bucket probe opens. A file whose bucket range spans `s`
  *    of the `nb` buckets is opened by s/nb of probes, so
  *    E[probe bytes]/total = Σ_f bytes_f · span_f / (nb · total).
  *    Near 1/|files| the layout is as sharp as it can be; growth
  *    toward 1 means files span too many buckets — streaming appends
  *    un-compacted (fix: the clustered maintenance tick) or nb far
  *    above the file count (fix: nothing — probes already open ~one
  *    file). Past `probeFractionBound` the advice names the clustered
  *    OPTIMIZE first, a bigger-nb rebuild second.
  *  - HOT-BUCKET decay: the byte mass a single bucket can force a
  *    probe to read, as a share of the index —
  *    max_b Σ_{f: range_f ∋ b} bytes_f / total, computed exactly by a
  *    boundary sweep over the file ranges (driver-side, O(F log F)).
  *    A share past `hotShareBound` means one bucket's postings
  *    dominate the index (df skew the hash cannot spread); the advice
  *    recommends rebuilding with a larger `nb` — more buckets shrink
  *    every bucket's share except a single pathological key's, which
  *    the message also names as a df-cap candidate.
  *
  * Below `minBytes` the advice ABSTAINS: byte shares over a toy index
  * are noise, and re-bucketing on noise churns readers for nothing
  * (the [[VectorIndex.indexAdvice]] row-floor argument, in bytes
  * because bytes are what the manifest prices probes in).
  */
object IndexHealth {

  /** What [[bucketIndexAdvice]] decided and why — all inputs are one
    * manifest read, zero data I/O.
    */
  case class BucketIndexAdvice(
      rebuildAdvised: Boolean,
      probeFraction: Option[Double],
      hotBucketShare: Option[Double],
      totalBytes: Long,
      files: Int,
      reason: String)

  /** The decision. `column` is the bucket column; `totalBuckets` the
    * build-time bucket count (bands × nb for the shingle index, nb for
    * the text/posting indexes). Files without usable stats count as
    * spanning every bucket — the conservative direction for BOTH
    * signals (they inflate decay, never hide it), matching pruning's
    * own keep-don't-guess rule.
    */
  def bucketIndexAdvice(spark: SparkSession, path: String, column: String,
                        totalBuckets: Int,
                        minBytes: Long = 64L << 20,
                        probeFractionBound: Double = 0.25,
                        hotShareBound: Double = 0.25): BucketIndexAdvice = {
    require(totalBuckets >= 1, s"totalBuckets must be >= 1, got $totalBuckets")
    val ranges = Warehouse.snapshotFileRanges(spark, path, column)
    val known = ranges.collect { case (Some(b), r) => (b, r) }
    val total = known.map(_._1).sum
    if (total < minBytes)
      return BucketIndexAdvice(rebuildAdvised = false, None, None, total, known.size,
        s"only $total index bytes (< $minBytes) — probe decay over a small " +
          "index is noise; not enough signal to advise")
    val nb = totalBuckets.toDouble
    // statless files span everything; stats clamp into [0, nb-1]
    val spans = known.map { case (b, r) =>
      val (lo, hi) = r.map { case (mn, mx) =>
        (math.max(0.0, mn), math.min(nb - 1.0, mx)) }
        .getOrElse((0.0, nb - 1.0))
      (b, lo, math.max(lo, hi))
    }
    val probeFraction =
      spans.map { case (b, lo, hi) => b.toDouble * (hi - lo + 1.0) / nb }.sum / total
    // exact max-overlap byte mass via a boundary sweep: +bytes at lo,
    // -bytes after hi; the running sum peaks at the hottest bucket
    // removals sort before additions at the same boundary: a file
    // ending at bucket k and one starting at k+1 never co-occupy a
    // bucket, and must not co-count at the k+1 boundary
    val events = spans.flatMap { case (b, lo, hi) =>
      Seq((lo, b), (hi + 1.0, -b)) }.sortBy(e => (e._1, e._2))
    var running = 0L
    var peak = 0L
    events.foreach { case (_, delta) =>
      running += delta; if (running > peak) peak = running }
    val hotShare = peak.toDouble / total
    val fractionHit = probeFraction >= probeFractionBound
    val hotHit = hotShare >= hotShareBound
    val reason =
      if (hotHit)
        f"hottest bucket can force $hotShare%.2f of the index bytes into one " +
          f"probe (>= $hotShareBound%.2f) — bucket skew the layout cannot " +
          "spread; rebuild with a larger bucket count (or df-cap the " +
          "dominating key) before probes degrade to scans"
      else if (fractionHit)
        f"a single-bucket probe opens $probeFraction%.2f of the index bytes " +
          f"on average (>= $probeFractionBound%.2f) — files span too many " +
          "buckets; run the index's CLUSTERED maintenance tick first " +
          "(un-compacted streaming appends are the usual cause), and if the " +
          "fraction persists, rebuild with a larger bucket count"
      else
        f"probe fraction $probeFraction%.2f, hottest-bucket share " +
          f"$hotShare%.2f — the layout still prices probes at a small " +
          "fraction of the index"
    BucketIndexAdvice(fractionHit || hotHit, Some(probeFraction), Some(hotShare),
      total, known.size, reason)
  }

  /** What [[auditIndexCoverage]] found. `missing` = corpus ids with no
    * index row (every answer silently excludes them until a refresh
    * runs); `orphaned` = index ids no longer in the corpus (they decay
    * screens/probes with dead candidates; a delete on the corpus
    * without an index rebuild is the usual cause). Sample ids are
    * capped, for the log line — counts are exact.
    */
  case class CoverageAudit(
      corpusIds: Long,
      indexIds: Long,
      missing: Long,
      orphaned: Long,
      missingSample: Seq[Long],
      orphanedSample: Seq[Long],
      nullCorpusIds: Long = 0L) {
    def consistent: Boolean = missing == 0 && orphaned == 0 && nullCorpusIds == 0
  }

  /** CORPUS ↔ INDEX coverage audit (r16): the invariant every
    * persisted index's refresh discipline maintains — index ids ≡
    * corpus ids — CHECKED, for the deployments where the discipline
    * can be bypassed (a corpus table written by another job, a
    * restored backup, a delete that skipped the index). Two id-grain
    * anti-joins over column-pruned scans: the only columns read are
    * the two id columns, so at 100 TB the audit costs two id-column
    * scans + one shuffle at id grain, never a byte of text/embedding
    * data. The per-index wrappers hand this the right id column;
    * presence sentinels (NULL-token/hash rows) make EVERY doc visible
    * to the index side, so a sentinel-bearing index audits clean.
    *
    * This is a DIAGNOSTIC, deliberately not auto-repair: `missing`
    * routes to the index's refresh (anti-join semantics make it
    * exactly the repair), `orphaned` to a rebuild — the same
    * owner-schedules split as every advice API here.
    */
  def auditIndexCoverage(corpusIds: org.apache.spark.sql.DataFrame,
                         indexPath: String, indexIdCol: String,
                         sampleK: Int = 10): CoverageAudit = {
    val spark = corpusIds.sparkSession
    require(corpusIds.columns.length == 1,
      s"auditIndexCoverage: pass ONE id column, got ${corpusIds.columns.toSeq}")
    val cid = corpusIds.columns.head
    // dirty input is THE audit's use case (r16 review): a NULL id (or
    // a value whose long cast nulls out) must surface as its own
    // finding, not poison the anti-joins or NPE the sample collect
    val cast = corpusIds.select(org.apache.spark.sql.functions.col(cid)
      .cast("long").as("id")).localCheckpoint(true)
    val nullIds = cast.filter(org.apache.spark.sql.functions.col("id").isNull).count()
    val corpus = cast.na.drop().distinct().localCheckpoint(true)
    val idx = Warehouse.readSnapshot(spark, indexPath)
      .select(org.apache.spark.sql.functions.col(indexIdCol).as("id"))
      .na.drop().distinct().localCheckpoint(true)
    val missing = corpus.join(idx, Seq("id"), "left_anti").localCheckpoint(true)
    val orphaned = idx.join(corpus, Seq("id"), "left_anti").localCheckpoint(true)
    CoverageAudit(
      corpus.count(), idx.count(), missing.count(), orphaned.count(),
      missing.limit(sampleK).collect().map(_.getLong(0)).toSeq,
      orphaned.limit(sampleK).collect().map(_.getLong(0)).toSeq,
      nullCorpusIds = nullIds)
  }
}
