package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE merge-rule induction (Sennrich et al. '16, the
  * tokenizer-vocabulary workhorse of every LLM data pipeline): learn
  * the top `merges` byte-pair merges over a corpus by repeatedly
  * counting adjacent symbol pairs (frequency-weighted by word count)
  * and merging the most frequent pair everywhere.
  *
  * Scale shape — the part that matters at 100 TB:
  *  - The ONLY corpus-scale pass is the initial word-count aggregate
  *    (per-row [[graft.functions.Kernels.tokenCounts]] kernel +
  *    hash-agg, one shuffle at word grain). Everything after runs at
  *    VOCABULARY grain — distinct words with frequencies — which is
  *    bounded by language, not data size (~10⁶–10⁷ rows for any
  *    corpus, whether 1 GB or 100 TB).
  *  - Each merge round is two vocab-grain jobs: an adjacent-pair
  *    explode + hash-agg with a deterministic TakeOrdered(1) argmax
  *    (freq desc, pair asc — ties never depend on partitioning), and
  *    a per-row greedy left-to-right remerge via an `aggregate` HOF
  *    (no UDF, no driver loop over words). Only the single winning
  *    pair ever hits the driver — the k-means-centroid trade.
  *  - `localCheckpoint` truncates lineage each round so round i
  *    doesn't replan rounds 1..i−1 (same discipline as
  *    [[Dedup.nearDupClusters]]).
  *
  * Returns the learned rules as (step, left, right, freq) — step is
  * 1-based merge order, freq the weighted pair count at merge time.
  * Rows-only vs an oracle by nature (the fixpoint loop isn't ANSI
  * SQL); BpeSpec pins the exact merge sequence on a hand-computed
  * corpus instead.
  */
object Bpe {

  /** Greedy left-to-right single-pair merge over a symbol array:
    * [l, r] occurrences become their concatenation, scanning once —
    * "aaa" under (a,a) yields [aa, a], the standard BPE behavior.
    */
  private def mergePair(symbols: Column, left: String, right: String): Column = {
    val l = lit(left)
    val r = lit(right)
    aggregate(symbols,
      array().cast("array<string>"),
      (acc, x) =>
        // `get` (0-based) is null-safe on the empty accumulator where
        // ANSI-mode element_at(acc, -1) would raise
        when(get(acc, size(acc) - 1) === l && x === r,
          concat(slice(acc, lit(1), size(acc) - 1), array(concat(l, r))))
          .otherwise(concat(acc, array(x))))
  }

  /** Learn up to `merges` merge rules from `df`'s `textCol`. Stops
    * early when no adjacent pair occurs at least `minFreq` times.
    */
  def learn(df: DataFrame, merges: Int, minFreq: Long = 2L,
            textCol: String = "text"): DataFrame =
    learnWithSegmentation(df, merges, minFreq, textCol)._1

  /** [[learn]], also returning the final segmentation table
    * (word, freq, pieces) — the vocab-grain dictionary [[encode]]
    * joins against. Both frames are materialized (vocab-grain) when
    * this returns; neither re-runs the merge loop.
    */
  def learnWithSegmentation(df: DataFrame, merges: Int, minFreq: Long = 2L,
                            textCol: String = "text"): (DataFrame, DataFrame) = {
    require(merges >= 1, s"merges must be >= 1, got $merges")
    val spark = df.sparkSession
    // corpus → vocabulary: the one data-scale aggregate
    val words = df
      .select(explode(graft.functions.native.tokenCounts(col(textCol))).as("tc"))
      .groupBy(col("tc.token").as("word")).agg(sum(col("tc.tf")).as("freq"))
      .filter(length(col("word")) > 0)
    var cur = words
      .withColumn("symbols", split(col("word"), ""))
      .select("word", "freq", "symbols")
      .localCheckpoint(true)
    val rules = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var step = 1
    var done = false
    while (step <= merges && !done) {
      // adjacent pairs of the current segmentation, weighted by word freq
      val pairTop = cur
        .select(col("freq"), explode(
          zip_with(
            slice(col("symbols"), lit(1), size(col("symbols")) - 1),
            slice(col("symbols"), lit(2), size(col("symbols")) - 1),
            (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("freq").as("c"))
        .orderBy(desc("c"), asc("l"), asc("r"))
        .limit(1).collect()
      if (pairTop.isEmpty || pairTop.head.getAs[Long]("c") < minFreq) done = true
      else {
        val (l, r, c) = (pairTop.head.getAs[String]("l"),
          pairTop.head.getAs[String]("r"), pairTop.head.getAs[Long]("c"))
        rules += ((step, l, r, c))
        val next = cur.withColumn("symbols", mergePair(col("symbols"), l, r))
          .localCheckpoint(true)
        cur.unpersist()
        cur = next
        step += 1
      }
    }
    import spark.implicits._
    val rulesDf = rules.toSeq.toDF("step", "left", "right", "freq")
    val seg = cur.select(col("word"), col("freq"), col("symbols").as("pieces"))
    (rulesDf, seg)
  }

  /** Apply a learned segmentation to a corpus: per-doc piece counts
    * and tokenizer fertility (pieces per word — the sentencepiece
    * coverage metric; 1.0 = every word is a single learned unit).
    * Words outside the segmentation vocabulary fall back to
    * character-level (|word| pieces), the standard OOV behavior.
    *
    * Shape: the corpus stays at per-doc DISTINCT-token grain (the
    * tokenCounts kernel counts inside the row), the segmentation
    * joins BROADCAST at |vocab| rows with only piece COUNTS (the
    * arrays never move), and the doc-grain aggregate partial-combines
    * map-side. Past broadcast vocab (~10⁸ words) switch to a shuffle
    * join on word — same algebra (docs/SCALE.md).
    */
  def encode(docs: DataFrame, segmentation: DataFrame,
             textCol: String = "text"): DataFrame = {
    val sizes = segmentation
      .select(col("word"), size(col("pieces")).cast("long").as("n_pc"))
    docs
      .select(col("doc_id"),
        explode(graft.functions.native.tokenCounts(col(textCol))).as("tc"))
      .select(col("doc_id"), col("tc.token").as("word"), col("tc.tf").as("tf"))
      .filter(length(col("word")) > 0)
      .join(broadcast(sizes), Seq("word"), "left_outer")
      .groupBy("doc_id")
      .agg(sum(col("tf")).as("n_words"),
        sum(col("tf") * coalesce(col("n_pc"), length(col("word")).cast("long")))
          .as("n_pieces"))
      .withColumn("fertility",
        round(col("n_pieces").cast("double") / col("n_words").cast("double"), 6))
  }
}
