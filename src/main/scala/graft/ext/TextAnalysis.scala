package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.Mat.MatOps

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, document fingerprinting. All pure
  * codegen'd expressions — no UDFs — so they run inside whole-stage
  * codegen and scale linearly with one scan and zero shuffles.
  */
object TextAnalysis {

  def tokens(text: Column): Column = split(lower(text), " ")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count estimate: words + extra tokens for long
    * words (≈1 token per 4 chars beyond the first 4) + punctuation —
    * a deterministic regex/arithmetic stand-in for a real tokenizer.
    */
  def tokenCountBpe(text: Column): Column = {
    val t = tokens(text)
    val wordPieces = aggregate(t,
      lit(0L), (acc, w) =>
        acc + lit(1L) + greatest(lit(0L), floor((length(w) - 1) / lit(4.0)).cast("long")))
    val punct = length(regexp_replace(text, "[^.,!?;:]", "")).cast("long")
    wordPieces + punct
  }

  /** Function-word occurrence ratio for one language's stopword list. */
  private def stopwordRatio(text: Column, words: Seq[String]): Column = {
    val t = tokens(text)
    size(filter(t, w => w.isin(words.map(lit(_)): _*))).cast("double") / size(t)
  }

  val StopwordsEn = Seq("the", "a", "and", "of", "to", "in", "is", "it")
  val StopwordsEs = Seq("el", "la", "de", "que", "y", "en", "un", "los")
  val StopwordsDe = Seq("der", "die", "das", "und", "ist", "von", "mit", "den")
  val StopwordsFr = Seq("le", "la", "de", "et", "les", "des", "un", "une")
  val StopwordsZh = Seq("的", "是", "在", "了", "我", "有", "和", "人")

  /** Heuristic language ID: per-language function-word hit rates with
    * a fixed preference order on ties (en > es > de > fr > zh). The
    * real-world form swaps the word lists for character n-gram
    * profiles; the operator shape (k scored expressions + argmax) is
    * identical.
    */
  def langScores(text: Column): Seq[(String, Column)] = Seq(
    "en" -> stopwordRatio(text, StopwordsEn),
    "es" -> stopwordRatio(text, StopwordsEs),
    "de" -> stopwordRatio(text, StopwordsDe),
    "fr" -> stopwordRatio(text, StopwordsFr),
    "zh" -> stopwordRatio(text, StopwordsZh))

  def langId(text: Column): Column = {
    val scores = langScores(text)
    // first language (in preference order) whose score is the max
    scores.foldRight(lit("und")) { case ((lang, s), els) =>
      when(scores.map(_._2).map(s >= _).reduce(_ && _), lit(lang)).otherwise(els)
    }
  }

  /** Quality features + a deterministic composite score in [0, ~1]:
    * rewards length (saturating at 100 tokens), function-word density,
    * and word-length plausibility. Mirrors the shape of
    * Gopher/C4-style quality rules.
    */
  def qualityFeatures(df: DataFrame, textCol: String = "text"): DataFrame = {
    val text = col(textCol)
    val t = tokens(text)
    df.withColumn("n_tokens", size(t).cast("long"))
      .withColumn("avg_token_len",
        length(regexp_replace(text, " ", "")).cast("double") / size(t))
      .withColumn("stopword_ratio", stopwordRatio(text, StopwordsEn))
      .withColumn("punct_ratio",
        length(regexp_replace(text, "[^.,!?;:]", "")).cast("double") /
          greatest(length(text), lit(1)).cast("double"))
      .withColumn("quality_score",
        least(col("n_tokens").cast("double") / 100.0, lit(1.0)) * 0.5 +
        col("stopword_ratio") * 0.3 +
        least(col("avg_token_len") / 10.0, lit(1.0)) * 0.2)
  }

  /** Corpus vocabulary: the `topN` most frequent tokens (ties broken
    * by token for determinism). Explode + count partial-aggregates
    * map-side, so the shuffle carries one row per distinct token per
    * partition; the final top-N is a TakeOrdered, not a full sort.
    */
  def vocabulary(df: DataFrame, topN: Int, textCol: String = "text"): DataFrame =
    df.select(explode(tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("freq"))
      .orderBy(desc("freq"), asc("token"))
      .limit(topN)

  /** Per-document out-of-vocabulary rate against the corpus top-`topN`
    * vocabulary — the tokenizer-coverage signal: docs with high OOV
    * against the working vocab are script/noise outliers the tokenizer
    * will shred into bytes. Vocabulary rides a broadcast (topN rows by
    * construction); the corpus explodes once and aggregates back to
    * doc grain — one shuffle, identical at any corpus size. Ties at
    * the rank-`topN` boundary break on token text, so the vocab set is
    * engine-deterministic.
    */
  def oovRate(df: DataFrame, topN: Int = 1000, textCol: String = "text"): DataFrame = {
    val vocab = vocabulary(df, topN, textCol)
      .select(col("token"), lit(1).as("__in"))
    df.select(col("doc_id"), explode(tokens(col(textCol))).as("token"))
      .join(broadcast(vocab), Seq("token"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__in").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate", round(col("n_oov") / col("n_tokens"), 6))
  }

  /** Zipf-law fit over the corpus vocabulary: OLS slope / intercept /
    * R² of ln(freq) against ln(rank) for the `topN` most frequent
    * tokens. Natural text tracks slope ≈ −1; a slope far from it (or
    * low R²) flags templated/synthetic corpora — a cheap corpus-level
    * health signal next to the per-doc quality features.
    *
    * Shape: the vocabulary agg partial-aggregates map-side and its
    * output is bounded by `topN`; the rank window and the regr_*
    * co-moment aggregates then run over those topN rows only (the
    * single-partition window is bounded by construction, not by data
    * volume). regr_slope/intercept/r2 are one-pass mergeable
    * aggregates — no second scan, no collect.
    */
  def zipfFit(df: DataFrame, topN: Int = 1000, textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ranked = vocabulary(df, topN, textCol)
      .withColumn("rank", row_number().over(Window.orderBy(desc("freq"), asc("token"))))
    ranked.agg(
      count(lit(1)).as("n_terms"),
      round(expr("regr_slope(ln(freq), ln(rank))"), 6).as("slope"),
      round(expr("regr_intercept(ln(freq), ln(rank))"), 6).as("intercept"),
      round(expr("regr_r2(ln(freq), ln(rank))"), 6).as("r2"))
  }

  /** Stable hash bucket in [0, mod): md5 of the id, first 8 hex digits
    * mod `mod`. 8 digits (2³²) rather than 4 (2¹⁶) is load-bearing:
    * 65536 % 10000 = 5536, so a 16-bit bucket mod 10000 hits
    * 0..5535 with probability 7/65536 vs 6/65536 for the rest — a
    * systematic ~8% inflation of small keep-fractions. At 2³² the
    * residual bias is ≤ 2.4e-6 relative. Shared by every deterministic
    * sampling/split operator so engines agree digit-for-digit.
    */
  private def hashBucket(idCol: String, mod: Int) =
    conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("long") % mod

  /** Deterministic train/val/test assignment from a stable content
    * key: md5 of the id → [0,100) bucket, split 80/10/10. Pure
    * expression — the same row lands in the same split on any engine,
    * any run, any partitioning (the property a training pipeline needs
    * so replays never leak val into train).
    */
  def splitAssign(df: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val bucket = hashBucket(idCol, 100)
    df.withColumn("split",
      when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test"))
  }

  /** Deterministic domain-mixture resampling: keep each document with
    * a per-source probability decided by a stable content hash (md5 of
    * the id, 4 hex digits mod 10000) rather than an RNG, so the SAME
    * rows survive on any engine, any run, any partitioning — the
    * property a training pipeline needs for reproducible mixtures and
    * honest ablations. `weights` maps source → keep fraction in [0,1];
    * sources absent from the map keep everything.
    *
    * Shape: pure per-row expressions (hash bucket + a literal CASE
    * chain), zero shuffles; the filter sits directly over the scan.
    */
  def mixtureSample(df: DataFrame, weights: Map[String, Double],
                    idCol: String = "doc_id",
                    sourceCol: String = "source"): DataFrame = {
    require(weights.values.forall(w => w >= 0.0 && w <= 1.0),
      s"keep fractions must be in [0,1]: $weights")
    val bucket = hashBucket(idCol, 10000)
    val frac = weights.toSeq.sortBy(_._1).foldLeft(lit(1.0)) {
      case (els, (src, w)) => when(col(sourceCol) === src, lit(w)).otherwise(els)
    }
    df.filter(bucket < frac * 10000)
  }

  /** Epoch-mixing generalization of [[mixtureSample]] to weights ABOVE
    * 1: each document is emitted `floor(w)` times, plus one more copy
    * for the stable hash-selected fraction `w - floor(w)` of its
    * source — so a source weighted 2.5 contributes each doc twice and
    * half its docs (always the same half) a third time. Output rows
    * carry `copy_idx` (0-based) so downstream shuffling/packing can
    * spread the copies. Weight 0 drops the source; missing sources
    * default to weight 1.
    *
    * Shape: per-row expressions + a bounded `sequence` explode — zero
    * shuffles, output volume is exactly Σ source_rows · w.
    */
  def mixtureResample(df: DataFrame, weights: Map[String, Double],
                      idCol: String = "doc_id",
                      sourceCol: String = "source"): DataFrame = {
    require(weights.values.forall(_ >= 0.0),
      s"weights must be non-negative: $weights")
    val bucket = hashBucket(idCol, 10000)
    val w = weights.toSeq.sortBy(_._1).foldLeft(lit(1.0)) {
      case (els, (src, x)) => when(col(sourceCol) === src, lit(x)).otherwise(els)
    }
    val copies = floor(w).cast("long") +
      when(bucket < (w - floor(w)) * 10000, 1L).otherwise(0L)
    df.withColumn("__n", copies)
      .filter(col("__n") > 0)
      .withColumn("copy_idx", explode(sequence(lit(0L), col("__n") - 1)))
      .drop("__n")
  }

  /** Corpus-derived unigram language-model score: mean log10 p(token)
    * per document, with p(t) the MLE estimate freq(t)/total from the
    * corpus itself. The CCNet-style LM quality filter shape — documents
    * made of rare tokens score low; downstream buckets or drops them.
    * Scores are rounded to 6 dp so the value is portable across
    * engines' float-summation orders.
    *
    * Shape: the per-row [[graft.functions.Kernels.tokenCounts]] kernel
    * counts tokens inside each document, so the explode emits one row
    * per DISTINCT token per doc; the vocab agg's output is bounded by
    * vocabulary size and broadcasts back, and the only full shuffle is
    * the per-doc aggregate. The grand total rides a 1-row broadcast
    * cross join — no second pass over the corpus. The per-doc mean is
    * the tf-weighted sum over distinct tokens (≡ the per-instance mean
    * mathematically; the 6 dp rounding absorbs float-order drift).
    */
  def unigramLogProb(df: DataFrame, textCol: String = "text"): DataFrame = {
    // per-row TF kernel: the corpus never shuffles at token grain —
    // rows after the explode are one per DISTINCT token per doc.
    // tf feeds the vocab build and the scoring join, vocab feeds the
    // normalizer and the same join — materialize each once (cluster
    // swap for tf: persist(DISK_ONLY), it is corpus-sized)
    val tf = df.select(col("doc_id"),
        explode(graft.functions.native.tokenCounts(col(textCol))).as("tc"))
      .select(col("doc_id"), col("tc.token").as("token"), col("tc.tf").as("tf"))
      .matBoundary
    val vocab = tf.groupBy("token").agg(sum("tf").as("freq")).matBoundary
    val total = vocab.agg(sum("freq").as("total"))
    tf.join(broadcast(vocab), "token")
      .groupBy("doc_id")
      .agg(sum("tf").as("n_tokens"),
        (sum(col("tf") * log10(col("freq"))) / sum("tf")).as("__alf"))
      .crossJoin(broadcast(total))
      .select(col("doc_id"), col("n_tokens"),
        round(col("__alf") - log10(col("total")), 6).as("avg_logp"))
  }

  /** Per-document bigram-LM quality score: mean log10 p(w₂|w₁) under
    * an add-k–smoothed corpus bigram model — the next step up from
    * [[unigramLogProb]]'s CCNet-style scoring (a unigram model can't
    * see scrambled word order; a bigram model scores it down):
    *
    *   p(w₂|w₁) = (c(w₁w₂) + k) / (c(w₁·) + k·V)
    *
    * with c(w₁·) = occurrences of w₁ in non-final position and V the
    * corpus unigram vocabulary. Docs with fewer than 2 tokens emit no
    * row (they have no bigrams), same as the oracle's inner join.
    *
    * Shape: one corpus pass builds bigram instances via the per-row
    * [[graft.functions.Kernels.wordNgrams]] kernel; model counts are
    * two hash-aggs over that explode, joined back BROADCAST so the
    * instance stream never shuffles at bigram grain — the final
    * per-doc mean partial-aggregates map-side, so the only corpus-
    * grain shuffle carries doc-grain rows. Past broadcast size
    * (bigram vocab ~10⁸), switch the count joins to shuffle joins and
    * pre-reduce instances to per-doc distinct (bigram, tf) first —
    * same algebra, tf-weighted (docs/SCALE.md).
    */
  def bigramLogProb(df: DataFrame, k: Double = 1.0,
                    textCol: String = "text"): DataFrame = {
    // bg feeds the model build AND the scoring join — materialize it
    // once (cluster swap: persist(DISK_ONLY), it is corpus-sized); the
    // context counts then reduce the |distinct bigrams| frame instead
    // of a second corpus-grain pass: c(w₁·) = Σ c over w₁'s bigrams
    val bg = df.select(col("doc_id"),
      explode(graft.functions.native.wordNgrams(col(textCol), 2)).as("bigram"))
      .matBoundary
    val bigramCounts = bg.groupBy("bigram").agg(count(lit(1)).as("c"))
      .matBoundary
    val contextCounts = bigramCounts
      .groupBy(substring_index(col("bigram"), " ", 1).as("w1"))
      .agg(sum("c").as("cc"))
    val vocab = df
      .select(explode(graft.functions.native.tokenCounts(col(textCol))).as("tc"))
      .agg(countDistinct(col("tc.token")).as("vs"))
    bg.withColumn("w1", substring_index(col("bigram"), " ", 1))
      .join(broadcast(bigramCounts), "bigram")
      .join(broadcast(contextCounts), "w1")
      .crossJoin(broadcast(vocab))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(log10((col("c") + lit(k)) / (col("cc") + lit(k) * col("vs")))), 6)
          .as("avg_logp"))
  }

  /** CCNet-style LM-quality bucketing (Wenzek et al. 2020): score
    * every doc with the corpus bigram LM ([[bigramLogProb]]), then
    * WITHIN EACH LANGUAGE split the corpus into equal head/middle/tail
    * buckets by score — head = most natural text, tail = the
    * boilerplate/scramble end. CCNet buckets by Wikipedia-LM
    * perplexity per language; the within-language ntile is the exact
    * analog with the in-corpus model standing in for the external LM.
    * Ordering is (avg_logp DESC, doc_id) so ties cut deterministically
    * — the bucket boundary at rank N/3 must not be engine-dependent.
    * Docs with <2 tokens have no bigrams and emit no row, as in the
    * scorer.
    *
    * Shape: the scorer's one corpus pass + broadcast model joins, then
    * a doc-grain `lang` join (doc-grain rows only — text never
    * re-shuffles) and one ntile window per language. Language
    * cardinality is tiny and fixed, so the window's per-partition sort
    * is the n·log n a 3-quantile split costs anywhere; a skewed
    * language at 100 TB swaps ntile for approx percentile cutpoints
    * (two scans, no full sort) at the cost of exact thirds.
    */
  def perplexityBucket(df: DataFrame, k: Double = 1.0,
                       textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = bigramLogProb(df, k, textCol)
      .join(df.select(col("doc_id"), col("lang")), "doc_id")
    val tercile = ntile(3).over(
      Window.partitionBy(col("lang")).orderBy(col("avg_logp").desc, col("doc_id")))
    scored.select(col("doc_id"), col("lang"), col("avg_logp"),
      when(tercile === 1, lit("head")).when(tercile === 2, lit("middle"))
        .otherwise(lit("tail")).as("bucket"))
  }

  /** Per-document lexical statistics: token count, type (distinct
    * token) count, type-token ratio, and the Shannon entropy (bits) of
    * the document's own unigram distribution — the standard lexical
    * diversity / degenerate-text signals (a 2-token loop has entropy
    * ≈1 regardless of length; natural prose sits near log2 of its
    * vocabulary). H = log2 n − (Σ c·log2 c)/n over the TF entries.
    * ttr/entropy are rounded to 6 dp so float-summation order never
    * leaks into comparisons.
    *
    * Shape: the per-row [[graft.functions.Kernels.tokenCounts]] kernel
    * builds the TF inside the row and two `aggregate` HOFs fold over
    * it — one scan, zero shuffles, zero joins; the corpus is never
    * exploded to token grain.
    */
  def lexicalStats(df: DataFrame, textCol: String = "text"): DataFrame = {
    val tc = graft.functions.native.tokenCounts(col(textCol))
    val n = aggregate(tc, lit(0L), (a, x) => a + x.getField("tf"))
    val sumCLogC = aggregate(tc, lit(0.0), (a, x) =>
      a + x.getField("tf").cast("double") * log2(x.getField("tf").cast("double")))
    df.select(col("doc_id"),
      n.as("n_tokens"),
      size(tc).cast("long").as("n_types"),
      round(size(tc).cast("double") / n.cast("double"), 6).as("ttr"),
      round(log2(n.cast("double")) - sumCLogC / n.cast("double"), 6).as("entropy"))
  }

  /** TF-IDF top-`k` terms per document: tf = in-doc term count, idf =
    * ln(N / df_t), ranked per doc by (rounded score desc, token asc).
    * The rounding is load-bearing for determinism: mathematically-equal
    * scores computed via different ln() paths must tie, and the token
    * tie-break must decide — otherwise the cut at rank k is
    * engine-dependent.
    *
    * Shape: explode → (doc, token) hash-agg (map-side partial), token
    * document-frequency agg bounded by vocab size and broadcast back,
    * then a per-doc window for the top-k. Two shuffles total at any
    * scale: the tf agg and the doc-partitioned rank.
    */
  def tfidfTopTerms(df: DataFrame, k: Int, textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nDocs = df.agg(count(lit(1)).cast("double").as("n_docs"))
    // per-row TF kernel — no corpus-wide groupBy(doc, token) shuffle.
    // tf feeds BOTH the df_t build and the scoring join: materialize it
    // once so the corpus explode doesn't run per consumer (cluster
    // swap: persist(DISK_ONLY) or a stage table — it is corpus-sized).
    // Unconditional (not Mat.matBoundary): kernel-heavy multi-consumer
    // subtree, the Mat doc's don't-gate case (A/B sf0.1: 0.80 s gated
    // vs 0.70 s forced)
    val tf = df.select(col("doc_id"),
        explode(graft.functions.native.tokenCounts(col(textCol))).as("tc"))
      .select(col("doc_id"), col("tc.token").as("token"), col("tc.tf").as("tf"))
      .localCheckpoint(true)
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df_t"))
    val scored = tf.join(broadcast(dfreq), "token")
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf",
        round(col("tf") * log(col("n_docs") / col("df_t")), 6))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy("doc_id").orderBy(desc("tfidf"), asc("token"))))
      .filter(col("rank") <= k)
      .select("doc_id", "rank", "token", "tf", "tfidf")
  }

  /** Corpus n-gram frequency table: the `topN` most frequent word
    * n-grams (raw occurrence counts — NOT per-doc distinct like the
    * dedup shingles), ties broken by the gram for determinism. The
    * standard corpus-statistics / LM-smoothing input.
    *
    * Shape: grams come from the one-pass [[graft.functions.Kernels
    * .wordNgrams]] codegen kernel (no join, no second scan), the count
    * partial-aggregates map-side so the shuffle carries one row per
    * distinct gram per partition, and the top-N is a TakeOrdered.
    */
  def ngramCounts(df: DataFrame, n: Int, topN: Int,
                  textCol: String = "text"): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    df.select(explode(graft.functions.native.wordNgrams(col(textCol), n)).as("ngram"))
      .groupBy("ngram").agg(count(lit(1)).as("freq"))
      .orderBy(desc("freq"), asc("ngram")).limit(topN)
  }

  /** Deterministic stratified sample: exactly min(`nPer`, group size)
    * documents per source, chosen by md5-of-id rank — the same docs on
    * any engine, any run. How eval slices and human-review batches get
    * drawn without an RNG seed fight.
    *
    * Shape: one hash-partitioned window per source; no global sort.
    * Skew note: a source with billions of rows still ranks inside one
    * partition — for that regime, pre-filter with [[mixtureSample]] to
    * a small multiple of `nPer` first (documented trade; exact top-N
    * per group needs the total order within the group).
    */
  /** Exact-quota stratified sample: keep exactly min(quota, |stratum|)
    * docs per source, chosen by the stable md5-of-id order — the
    * exact-count companion to [[mixtureSample]]'s fractional form (a
    * training mixture spec is usually "N docs from source X", not a
    * fraction, and Bernoulli sampling misses the target by √N).
    * Sources absent from `quotas` are DROPPED — explicit budget
    * semantics. Same 100 TB shape as [[samplePerSource]]: one
    * source-partitioned window rank (each stratum sorts in parallel),
    * quota lookup is a literal CASE chain, no second pass.
    */
  def stratifiedQuota(df: DataFrame, quotas: Map[String, Long],
                      idCol: String = "doc_id",
                      sourceCol: String = "source"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(quotas.values.forall(_ >= 0L), s"quotas must be >= 0: $quotas")
    val quotaCol = quotas.toSeq.sortBy(_._1).foldLeft(lit(-1L)) {
      case (els, (src, q)) => when(col(sourceCol) === src, lit(q)).otherwise(els)
    }
    df.withColumn("sample_rank", row_number().over(
        Window.partitionBy(col(sourceCol))
          .orderBy(md5(col(idCol).cast("string")), col(idCol))).cast("long"))
      .filter(col("sample_rank") <= quotaCol)
  }

  def samplePerSource(df: DataFrame, nPer: Int,
                      idCol: String = "doc_id",
                      sourceCol: String = "source"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nPer >= 1, s"nPer must be >= 1, got $nPer")
    df.withColumn("sample_rank", row_number().over(
        Window.partitionBy(col(sourceCol))
          .orderBy(md5(col(idCol).cast("string")), col(idCol))).cast("long"))
      .filter(col("sample_rank") <= nPer)
  }

  /** Per-source corpus health rollup — the dashboard a data curator
    * watches: doc count, mean quality score, mean duplicate-token
    * fraction, docs containing email PII, mean token count. All
    * features are per-row kernels/expressions, so the whole report is
    * ONE scan and one source-cardinality aggregate; means are rounded
    * to 6 dp for cross-engine portability.
    */
  def corpusHealth(df: DataFrame, sourceCol: String = "source",
                   textCol: String = "text"): DataFrame = {
    val feats = Pii.audit(qualityFeatures(df, textCol), textCol)
      .withColumn("__rep", graft.functions.native.repetitionStats(col(textCol)))
    feats.groupBy(col(sourceCol))
      .agg(
        count(lit(1)).as("n_docs"),
        round(avg(col("quality_score")), 6).as("avg_quality"),
        round(avg(lit(1.0) -
          col("__rep.n_distinct").cast("double") / col("__rep.n_tokens").cast("double")), 6)
          .as("avg_dup_frac"),
        sum(when(col("n_emails") > 0, 1L).otherwise(0L)).as("n_pii_docs"),
        round(avg(col("n_tokens").cast("double")), 6).as("avg_tokens"))
  }

  /** Token-count histogram: docs bucketed by floor(n_tokens / `width`),
    * with per-bucket doc counts and mean char length — the length
    * profile a packing/truncation budget is tuned against.
    * Zero joins: one scan, one vocab-sized-output aggregate.
    */
  def tokenHistogram(df: DataFrame, width: Int = 10,
                     textCol: String = "text"): DataFrame = {
    require(width >= 1, s"width must be >= 1, got $width")
    val nTok = size(tokens(col(textCol)))
    df.select(floor(nTok / width).cast("long").as("bucket"),
        length(col(textCol)).as("__nc"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col("__nc")), 6).as("avg_chars"))
  }

  /** Gopher-style repetition features: the fraction of duplicated
    * tokens, the mass of the single most frequent token, and the
    * fraction of duplicated bigrams. High values mark boilerplate /
    * degenerate documents a training pipeline should drop.
    *
    * Shape: every feature is a function of ONE document, so the whole
    * thing is a per-row kernel ([[graft.functions.RepetitionStatsExpr]]
    * — token counts, distinct counts, top-token mass, and distinct
    * bigrams in one pass over the text) plus arithmetic. Zero
    * shuffles. The round-2/3 form exploded the corpus into (doc,
    * token) rows and hash-aggregated twice to find the top token — a
    * full corpus shuffle for a value that never needed to leave its
    * row (and a per-doc `explode → groupBy doc_id` re-concentrates
    * every document's tokens into one task whatever the cluster size).
    *
    * Two-level projection: the kernel struct is aliased in an inner
    * Project and field-extracted in the outer one, so the single-pass
    * kernel runs once per row, not once per feature.
    */
  def repetitionFeatures(df: DataFrame, textCol: String = "text"): DataFrame =
    df.select(col("doc_id"),
        graft.functions.native.repetitionStats(col(textCol)).as("__r"))
      .select(
        col("doc_id"),
        col("__r.n_tokens").as("n_tokens"),
        col("__r.n_distinct").as("n_distinct"),
        (lit(1.0) - col("__r.n_distinct").cast("double") / col("__r.n_tokens").cast("double"))
          .as("dup_token_frac"),
        (col("__r.top_cnt").cast("double") / col("__r.n_tokens").cast("double"))
          .as("top_token_frac"),
        when(col("__r.n_tokens") >= 2,
          lit(1.0) - col("__r.n_distinct_bigrams").cast("double")
            / (col("__r.n_tokens") - 1).cast("double"))
          .otherwise(lit(0.0)).as("dup_bigram_frac"))

  /** Token-window document chunking — the standard pre-tokenization
    * step that splits long documents into overlapping max-`maxTokens`
    * windows advancing by `stride` tokens (stride < maxTokens gives
    * overlap so no span is ever cut mid-context). One row per chunk:
    * (doc_id, chunk_id, n_chunk_tokens, chunk_text).
    *
    * Shape: chunk descriptors are built per-row with a bounded
    * `transform(sequence(...))` and exploded — one scan, zero
    * shuffles; output volume is input×(1/stride) overhead, exactly the
    * overlap factor. A doc shorter than `maxTokens` yields one chunk
    * (its whole text).
    */
  def chunkTokens(df: DataFrame, maxTokens: Int = 128, stride: Int = 96,
                  textCol: String = "text"): DataFrame = {
    require(stride > 0 && maxTokens >= stride,
      s"need 0 < stride <= maxTokens, got stride=$stride maxTokens=$maxTokens")
    val t = tokens(col(textCol))
    val n = size(t)
    val nChunks = when(n <= maxTokens, lit(1))
      .otherwise(ceil((n - maxTokens) / lit(stride.toDouble)).cast("int") + 1)
    df.select(col("doc_id"), t.as("__toks"), n.as("__n"), nChunks.as("__nc"))
      .select(col("doc_id"), col("__n"),
        explode(transform(sequence(lit(0), col("__nc") - 1), i => struct(
          i.cast("long").as("chunk_id"),
          least(lit(maxTokens), col("__n") - i * stride).cast("long").as("n_chunk_tokens"),
          array_join(slice(col("__toks"), i * stride + 1, lit(maxTokens)), " ").as("chunk_text"))))
          .as("c"))
      .select(col("doc_id"), col("c.chunk_id"), col("c.n_chunk_tokens"), col("c.chunk_text"))
  }

  /** Text normalization for dedup keys / training input: lowercase,
    * trim, collapse whitespace runs, and drop adjacent repeated tokens
    * ("the the" → "the" — OCR/scrape stutter). Native one-pass kernel
    * ([[graft.functions.Kernels.normalizeText]]) — the HOF-lambda form
    * re-evaluated the trim/regex/split subtree per element (interpreted,
    * no subexpression sharing), i.e. O(tokens²) per document.
    */
  def normalizeText(text: Column): Column =
    graft.functions.native.normalizeText(text)

  /** Compression-ratio quality signal: deflated bytes / raw UTF-8
    * bytes (Gopher/FineWeb-style redundancy gate — template spam and
    * boilerplate deflate far below natural prose, random noise sits
    * near 1). Per-row codegen kernel, zero shuffles; empty text scores
    * a neutral 1.0. The ratio is deterministic for a fixed zlib level
    * within a JVM but not an ANSI-SQL-expressible function, so its
    * query key is rows-only with the ordering pinned in
    * TextAnalysisSpec.
    */
  def compressionRatio(text: Column): Column =
    when(text.isNull, lit(null).cast("double")) // propagate, like every kernel
      .when(octet_length(text) > 0,
        graft.functions.native.deflateLen(text).cast("double") /
          octet_length(text).cast("double"))
      .otherwise(lit(1.0)) // empty (non-null) text scores neutral

  /** Content fingerprint (exact dedup key): md5 of the text. */
  def fingerprintMd5(text: Column): Column = md5(text)

  /** Rolling polynomial fingerprint over token hashes — order-aware
    * (unlike md5-of-text it survives whitespace normalization
    * differences if tokens are normalized first): fp = Σ h(tokᵢ)·31ⁱ
    * mod 2³¹−1, computed as a left fold. Modular form keeps every
    * intermediate < 2³⁶ so ANSI mode never sees a Long overflow.
    * The per-token hash is the first 8 md5 hex digits (the same
    * engine-portable construction as [[splitAssign]]'s hashBucket),
    * so the fingerprint is reproducible on ANY engine with md5 —
    * which is what a fingerprint is for; a ~2× kernel-cost premium
    * over xxhash64 on a per-doc scan that is never the pipeline
    * bottleneck.
    */
  def fingerprintRolling(text: Column): Column =
    aggregate(tokens(text), lit(0L), (acc, w) =>
      pmod(acc * 31L +
        pmod(conv(substring(md5(w), 1, 8), 16, 10).cast("long"), lit(2147483647L)),
        lit(2147483647L)))

  /** BM25 keyword retrieval: top-`k` documents per query under
    * Robertson/Lucene BM25 — idf = ln(1 + (N−df+0.5)/(df+0.5)),
    * tf saturation k1, length normalization b against the mean doc
    * length. Ties (after 6-dp rounding) break by doc_id, so ranks are
    * engine-deterministic.
    *
    * Shape — the inverted-index probe order, which is what survives
    * 100 TB: the corpus TF explode is SEMI-JOINED down to the query
    * vocabulary (a broadcast of |∪ query terms| strings) BEFORE
    * anything shuffles, so df counts, scoring, and the per-query
    * top-k all run over |query terms| × df rows, never the corpus
    * token stream. Corpus-level stats (N, avg dl) are one 1-row agg
    * crossed in broadcast. The only corpus-grain work is the one
    * kernel scan.
    */
  def bm25TopK(df: DataFrame, queries: Seq[(Int, Seq[String])], k: Int,
               k1: Double = 1.2, b: Double = 0.75,
               textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(queries.nonEmpty && k >= 1)
    val spark = df.sparkSession
    import spark.implicits._
    val qterms = queries
      .flatMap { case (qid, ts) => ts.map(t => (qid, t.toLowerCase)) }
      .toDF("query_id", "token")
    val stats = df.agg(count(lit(1)).cast("double").as("n_docs"),
      avg(size(tokens(col(textCol)))).as("avg_dl"))
    // tf feeds BOTH dfreq and the scoring join — materialize it once
    // (it is |matching (doc, term)| grain, bounded by the query terms'
    // document frequency) so the corpus explode + semi-join runs once,
    // not once per consumer. Same boundary pattern as Dedup/
    // CorpusPipeline: localCheckpoint here, persist(DISK_ONLY) or a
    // parquet stage table on a cluster.
    val tf = df.select(col("doc_id"),
        size(tokens(col(textCol))).cast("double").as("dl"),
        explode(graft.functions.native.tokenCounts(col(textCol))).as("tc"))
      .select(col("doc_id"), col("dl"),
        col("tc.token").as("token"), col("tc.tf").cast("double").as("tf"))
      .join(broadcast(qterms.select("token").distinct()), Seq("token"), "left_semi")
      // unconditional (not Mat.matBoundary): the subtree is the corpus
      // tokenCounts explode — kernel-heavy, so leaf input bytes
      // understate recompute and the size gate mis-fires small
      // (A/B sf0.1: q_bm25 1.30 s gated vs 1.20 s forced)
      .localCheckpoint(true)
    val dfreq = tf.groupBy("token").agg(count(lit(1)).cast("double").as("df_t"))
    tf.join(broadcast(qterms), Seq("token"))
      .join(broadcast(dfreq), Seq("token"))
      .crossJoin(broadcast(stats))
      .withColumn("contrib",
        log(lit(1.0) + (col("n_docs") - col("df_t") + 0.5) / (col("df_t") + 0.5)) *
          (col("tf") * (k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avg_dl"))))
      .groupBy("query_id", "doc_id").agg(round(sum("contrib"), 6).as("bm25"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(desc("bm25"), asc("doc_id"))))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "doc_id", "bm25")
  }

  /** Temperature-scaled mixture weights (the multilingual-/domain-
    * balancing rule from mBERT/XLM-R and data-mixture papers):
    * p_temp(s) ∝ n_tokens(s)^alpha, alpha ∈ (0,1] — alpha=1 is the
    * natural distribution, alpha→0 uniform. Emits, per source, the
    * natural and temperature shares plus the sampling boost
    * p_temp/p_nat a mixture sampler ([[mixtureResample]]) would apply.
    *
    * Shape: one corpus scan → source-grain agg (map-side partial), then
    * the normalizing constants are a 1-row agg crossed in broadcast;
    * every post-scan frame is |sources| rows.
    */
  def temperatureMixture(df: DataFrame, alpha: Double,
                         sourceCol: String = "source",
                         textCol: String = "text"): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha in (0,1], got $alpha")
    val bySrc = df.groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(tokens(col(textCol))).cast("long")).as("n_tokens"))
    val z = bySrc.agg(sum(col("n_tokens")).cast("double").as("total"),
      sum(pow(col("n_tokens").cast("double"), alpha)).as("z_temp"))
    bySrc.crossJoin(broadcast(z))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        round(col("n_tokens") / col("total"), 6).as("p_nat"),
        round(pow(col("n_tokens").cast("double"), alpha) / col("z_temp"), 6)
          .as("p_temp"),
        round((pow(col("n_tokens").cast("double"), alpha) / col("z_temp")) /
          (col("n_tokens") / col("total")), 6).as("boost"))
  }

  /** Per-source unigram KL divergence against the corpus distribution,
    * both restricted to (and renormalized over) the corpus top-`topN`
    * vocabulary — the domain-shift score data-mixture audits sort by.
    * Terms a source never uses contribute 0 (lim p→0 of p·ln p).
    *
    * Shape: ONE corpus explode (per-row TF kernel) → (source, token)
    * partial-agg; the corpus distribution is then derived by summing
    * that frame over sources — no second scan — and the top-N vocab
    * joins back broadcast. Everything after the one token shuffle is
    * |sources|×topN-bounded.
    */
  def sourceDivergence(df: DataFrame, topN: Int = 200,
                       sourceCol: String = "source",
                       textCol: String = "text"): DataFrame = {
    // st feeds the vocab build AND the in-vocab join (and vocab itself
    // feeds two consumers) — materialize both once so the corpus
    // explode + (source, token) agg isn't re-evaluated per branch
    val st = df.select(col(sourceCol).as("source"),
        explode(graft.functions.native.tokenCounts(col(textCol))).as("tc"))
      .select(col("source"), col("tc.token").as("token"), col("tc.tf").as("tf"))
      .groupBy("source", "token").agg(sum("tf").as("f"))
      .matBoundary
    val vocab = st.groupBy("token").agg(sum(col("f")).as("freq"))
      .orderBy(desc("freq"), asc("token")).limit(topN)
      .matBoundary
    val corpusTot = vocab.agg(sum("freq").cast("double").as("c_tot"))
    val inVocab = st.join(broadcast(vocab), "token")
    val srcTot = inVocab.groupBy("source").agg(sum("f").cast("double").as("s_tot"))
    inVocab.join(broadcast(srcTot), "source")
      .crossJoin(broadcast(corpusTot))
      .withColumn("term",
        (col("f") / col("s_tot")) *
          log((col("f") / col("s_tot")) / (col("freq") / col("c_tot"))))
      .groupBy("source")
      .agg(count(lit(1)).as("n_terms"), round(sum("term"), 6).as("kl"))
  }

  /** Deterministic k-fold assignment for cross-validation: fold =
    * md5-bucket(id) mod `k` — the same engine-/partitioning-stable
    * hash family as [[splitAssign]], so folds are reproducible and
    * disjoint by construction. Pure per-row expressions, zero
    * shuffles.
    */
  def kfoldAssign(df: DataFrame, k: Int, idCol: String = "doc_id"): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    df.withColumn("fold", hashBucket(idCol, k))
  }

  /** Per-source adaptive quality gate: keep the top `keepFrac` of each
    * source's documents by composite quality score (6-dp rounded;
    * ties break by doc_id) — the per-domain threshold rule quality
    * filters use instead of one global cutoff, which would empty
    * low-resource domains. Rank-based, not percentile-threshold-based,
    * so the kept set is exact and engine-deterministic.
    *
    * Shape: per-row feature scoring inside the scan, then ONE shuffle
    * on source for the in-group rank. Same skew note as
    * [[samplePerSource]]: a billion-row source ranks inside one
    * partition — at that scale switch to the `approx_percentile`
    * threshold form (sketch per source, broadcast cutoffs back, filter;
    * trades exact top-N% for a mergeable one-pass bound).
    */
  def qualityGatePerSource(df: DataFrame, keepFrac: Double = 0.75,
                           sourceCol: String = "source",
                           textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(keepFrac > 0.0 && keepFrac <= 1.0)
    // the UNROUNDED score: the feature arithmetic is bit-identical
    // across engines (q_text_quality hash-matches it raw), whereas a
    // 6-dp round DIVERGES on binary ties — sf0.1's doc 720 scores
    // 0.42843749999999997, which DuckDB's shortest-decimal round sends
    // up and Spark's exact-binary BigDecimal round sends down
    val scored = qualityFeatures(df, textCol)
      .withColumn("score", col("quality_score"))
    scored
      .withColumn("qrank", row_number().over(
        Window.partitionBy(sourceCol).orderBy(desc("score"), asc("doc_id"))))
      .withColumn("n_src", count(lit(1)).over(
        Window.partitionBy(sourceCol)))
      .filter(col("qrank") <= ceil(col("n_src") * keepFrac))
      .select(col("doc_id"), col(sourceCol).as("source"), col("score"),
        col("qrank"))
  }
}
