package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-corpus preparation — the composition a pipeline
  * user actually runs, wired from the operator families so the stages
  * share scans where the shapes allow:
  *
  *  1. normalize text (one-pass kernel, in-place column)
  *  2. hygiene gates: quality score + repetition + PII — all per-row
  *     expressions, so stages 1-2 are ONE scan with zero shuffles
  *     (Catalyst collapses them into a single projection)
  *  3. decontaminate vs a benchmark set (broadcast shingles; the
  *     corpus side stays unshuffled)
  *  4. near-dup dedup (posting-list pairs + keep-first anti-join)
  *  5. deterministic train/val/test split (pure hash expression)
  *  6. deterministic order + fixed-token-budget packing PER SPLIT
  *     (range-partition prefix sum — the only total-order touch;
  *     packs never straddle train/val/test)
  *
  * Each stage is individually oracle-verified via its own query key;
  * the composition is covered by a determinism + stage-semantics spec
  * (CorpusPipelineSpec). Scale switch points for stage variants
  * (bloom decontam past ~10⁸ benchmark shingles, MinHash dedup past
  * ~10⁷ docs) are in docs/SCALE.md.
  */
object CorpusPipeline {

  final case class Config(
      minQuality: Double = 0.2,
      maxDupTokenFrac: Double = 0.8,
      maxPiiEmails: Long = 0L,
      decontamNgram: Int = 5,
      dedupNgram: Int = 3,
      dedupJaccard: Double = 0.8,
      packTokens: Long = 512L)

  /** docs: (doc_id, text, …); benchmark: held-out eval docs. One row
    * per surviving doc: (doc_id, text, quality_score, split, pack_id).
    */
  def prepare(docs: DataFrame, benchmark: DataFrame,
              cfg: Config = Config()): DataFrame = {
    // stages 1-2: one projection — normalize + quality + PII +
    // repetition features, then the gates
    val normalized = docs.withColumn("text", TextAnalysis.normalizeText(col("text")))
    val feats = Pii.audit(TextAnalysis.qualityFeatures(normalized))
      .withColumn("__rep", graft.functions.native.repetitionStats(col("text")))
      .withColumn("dup_token_frac",
        when(col("__rep.n_tokens") > 0,
          lit(1.0) - col("__rep.n_distinct").cast("double") / col("__rep.n_tokens").cast("double"))
          .otherwise(lit(0.0)))
    val hygienic = feats
      .filter(col("quality_score") >= cfg.minQuality)
      .filter(col("dup_token_frac") <= cfg.maxDupTokenFrac)
      .filter(col("n_emails") <= cfg.maxPiiEmails)
      .select("doc_id", "text", "quality_score")
    // stage 3: decontaminate (corpus unshuffled; broadcast benchmark).
    // The benchmark side gets the SAME normalization as the corpus —
    // shingling raw benchmark text against normalized corpus text
    // would miss contamination whose raw forms differ only in
    // whitespace runs / adjacent-duplicate tokens (exactly what
    // normalizeText folds), i.e. false negatives in the one stage
    // that promises none.
    val normBench = benchmark.withColumn("text", TextAnalysis.normalizeText(col("text")))
    // Stage boundary MATERIALIZED: the surviving corpus feeds both
    // sides of the dedup (pair build + anti-join) and, downstream, the
    // prefix sum's two passes — without it the scan→gates→decontam
    // subtree is recomputed up to 4× (measured 6.4 s → 4.1 s at
    // sf0.1). localCheckpoint is the single-JVM form: eager, executor-
    // local blocks, NOT fault-tolerant (an executor loss fails the
    // downstream job). On a cluster, swap the boundary for
    // persist(DISK_ONLY) or a staging-table write — same shape, same
    // one-materialization-vs-four-recomputes trade.
    val decontaminated = Contamination.clean(hygienic, normBench, cfg.decontamNgram)
      .localCheckpoint(true)
    // stage 4: near-dup keep-first
    val pairs = Dedup.ngramJaccardPairs(decontaminated, cfg.dedupNgram, cfg.dedupJaccard)
    val deduped = Dedup.dropNearDups(decontaminated, pairs)
    // stage 5: deterministic split
    val split = TextAnalysis.splitAssign(deduped)
    // stage 6: deterministic order + token-budget packing, PER SPLIT —
    // a pack must never straddle train/val/test (a mixed pack either
    // leaks val text into a train shard or has to be broken, voiding
    // the fixed-budget contract). pack_id is therefore unique per
    // (split, pack_id), not globally.
    // Second boundary: prefixSum streams its input twice (per-partition
    // totals, then the indexed pass) — they must see identical
    // partitions, and should not re-run the dedup anti-join.
    val withTokens = split.withColumn("n_tokens",
      TextAnalysis.tokenCount(col("text")).cast("long"))
      .localCheckpoint(true)
    graft.ops.TotalOrder.packSequencesPerGroup(withTokens, "split",
        Seq(md5(col("doc_id").cast("string")), col("doc_id")), "n_tokens", cfg.packTokens)
      .select("doc_id", "text", "quality_score", "split", "pack_id")
  }
}
