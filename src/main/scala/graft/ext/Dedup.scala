package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines —
  * the north-star extension family (BASELINE.json): exact dedup,
  * n-gram Jaccard near-dup, MinHash+LSH near-dup, SimHash near-dup.
  *
  * Design for 100 TB:
  *  - exact dedup is a hash aggregate (map-side partial, one shuffle
  *    on the content key, never a sort);
  *  - Jaccard runs on an inverted shingle index (explode + self-join
  *    on shingle) so cost is Σ df², not n²; `dfCap` drops
  *    ultra-common shingles, the standard guard against quadratic
  *    blowup on boilerplate shingles at scale;
  *  - MinHash/LSH replaces the inverted-index join with banded
  *    signature buckets: candidates are only generated inside a
  *    bucket, then verified with exact Jaccard — the linear-ish scale
  *    path (cf. Broder '97; MMDS ch.3 banding analysis);
  *  - SimHash gives 64-bit fingerprints; hamming-≤k candidates via
  *    the pigeonhole chunk trick (Manku et al., WWW'07), verified
  *    with bit_count.
  */
object Dedup {

  /** Lowercased whitespace tokens. */
  def tokens(text: Column): Column = split(lower(text), " ")

  /** Distinct word n-gram shingles — a native codegen expression
    * ([[graft.functions.WordShinglesExpr]]); semantically identical to
    * `array_distinct(transform(sequence(...), i => concat_ws(" ", ...)))`
    * over `split(lower(text), " ")` but ~100× cheaper per row (one
    * static call vs an interpreted higher-order-function tree).
    */
  def shingles(text: Column, n: Int = 3): Column =
    graft.functions.native.wordShingles(text, n)

  /** Exact dedup: one surviving row (smallest id) per distinct key.
    * `key` is any expression — full text, normalized text, or a
    * content hash like sha2(text, 256) when the key must stay small
    * on the shuffle wire at 100 TB.
    */
  def exact(df: DataFrame, key: Column, idCol: String = "doc_id"): DataFrame =
    df.groupBy(key.as("dedup_key"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_dups"))
      .select(idCol, "dedup_key", "n_dups")

  /** `size(split(text," ")) >= n` ⟺ the doc has ≥1 shingle, but costs
    * one split instead of the full shingle build — predicate pushdown
    * re-evaluates filter expressions per row, so the guard must be
    * cheaper than the projection it guards.
    */
  private def hasShingles(n: Int): Column = size(split(col("text"), " ")) >= n

  /** (doc_id, shingle) inverted index rows. No emptiness filter
    * needed: explode of an empty array emits no rows.
    *
    * With `dfCap` set, shingles present in more than `cap` docs are
    * dropped, so downstream Jaccard measures numerator and denominator
    * over the SAME (capped) shingle universe — i.e. the capped
    * operator is EXACT Jaccard on capped shingle sets, not an
    * underestimate of uncapped Jaccard (per-doc sizes are recounted on
    * the surviving rows by `ngramJaccardPairs`). The over-cap set is
    * tiny by construction (boilerplate headers/footers), so it
    * broadcasts as an anti-join — the rare majority never moves.
    */
  private def shingleIndex(docs: DataFrame, n: Int, dfCap: Option[Int]): DataFrame = {
    val sh = docs
      .select(col("doc_id"), explode(shingles(col("text"), n)).as("s"))
    dfCap match {
      case None => sh
      case Some(cap) =>
        val common = sh.groupBy("s").count().filter(col("count") > cap).select("s")
        sh.join(broadcast(common), Seq("s"), "left_anti")
    }
  }

  /** Exact n-gram Jaccard near-dup pairs: (a, b, jaccard) for
    * jaccard ≥ threshold, a < b. Deterministic — no hashing — so it
    * doubles as the verification oracle for the approximate variants.
    *
    * Shape: the big shingle-key self-join carries ONLY (doc_id, s) —
    * per-doc set sizes are aggregated separately (one row per doc,
    * always far smaller than the index) and joined onto the candidate
    * PAIR list, not onto the index. Carrying `n` through the index
    * join (the round-1 form) widened every shuffled row and needed a
    * window recount under dfCap; this form shuffles the minimum and
    * never window-sorts. The counts join is left unhinted: AQE
    * broadcasts it while counts fit (any test scale) and falls back to
    * a key shuffle of the pair list beyond that.
    */
  def ngramJaccardPairs(docs: DataFrame, n: Int = 3, threshold: Double = 0.8,
                        dfCap: Option[Int] = None): DataFrame = {
    val ex = shingleIndex(docs, n, dfCap)
    val counts = ex.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val a = ex.select(col("doc_id").as("a"), col("s"))
    val b = ex.select(col("doc_id").as("b"), col("s"))
    // shuffle-hash, not broadcast: the inverted index is large (one row
    // per doc×shingle) and only ever grows with the corpus — measured
    // 2.5× faster than broadcasting it even at sf0.1, and the only
    // join shape that survives 100 TB
    a.hint("shuffle_hash").join(b.hint("shuffle_hash"), a("s") === b("s") && a("a") < b("b"))
      .groupBy("a", "b")
      .agg(count(lit(1)).as("inter"))
      .join(counts.select(col("doc_id").as("a"), col("n").as("na")), Seq("a"))
      .join(counts.select(col("doc_id").as("b"), col("n").as("nb")), Seq("b"))
      .withColumn("jaccard", col("inter") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("a", "b", "jaccard")
  }

  /** The keep/drop DECISION from near-dup pairs: drop every doc that
    * has a near-duplicate with a smaller doc_id (keep-first rule —
    * one anti-join against the pair list's `b` side). Not full
    * connected components: a chain a~b~c with a≁c keeps a and c,
    * which is the standard training-data choice (transitive merging
    * over-deletes).
    */
  def dropNearDups(docs: DataFrame, pairs: DataFrame, idCol: String = "doc_id"): DataFrame =
    docs.join(pairs.select(col("b").as(idCol)).distinct(), Seq(idCol), "left_anti")

  // ---- MinHash + LSH ----

  /** Universal-hash parameters — shared with the SQL registry
    * (graft.functions.Registry) so both surfaces agree per seed.
    */
  private def hashParams(k: Int, seed: Long = 42L): (Array[Long], Array[Long]) =
    graft.functions.Kernels.minhashParams(k, seed)

  /** MinHash signatures: (doc_id, sig: array<long>[numHashes]),
    * computed per-doc in one codegen'd pass over the shingle array
    * ([[graft.functions.MinHashSigExpr]]) — zero shuffles, unlike the
    * equivalent explode + groupBy(numHashes × min) formulation, and
    * bit-identical to it (same xxhash64 base hash, same (a·x+b) mod P
    * family).
    */
  def minhashSignatures(docs: DataFrame, n: Int = 3, numHashes: Int = 128): DataFrame = {
    val (as, bs) = hashParams(numHashes)
    docs.filter(hasShingles(n))
      .select(col("doc_id"),
        graft.functions.native.minhashSig(shingles(col("text"), n), as, bs).as("sig"))
  }

  /** MinHash+LSH near-dup pairs, exact-Jaccard verified.
    * bands × rowsPerBand must equal numHashes; with 16×8 the detect
    * probability at j=0.9 is 1-(1-0.9⁸)¹⁶ ≈ 0.9999 and false
    * candidates at j=0.1 are ~0 — and every candidate is verified
    * against the true shingle sets anyway, so precision is exact.
    */
  def minhashNearDups(docs: DataFrame, n: Int = 3, numHashes: Int = 128,
                      bands: Int = 16, threshold: Double = 0.8): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val (as, bs) = hashParams(numHashes)
    // single-expression banded keys: the shingling + signature + band
    // hash run ONCE per row inside one kernel call. (A projected
    // signature column would be re-substituted — and the whole MinHash
    // recomputed — once per band reference in the explode.)
    val banded = docs.filter(hasShingles(n)).select(
      col("doc_id"),
      explode(graft.functions.native.minhashBandKeys(
        shingles(col("text"), n), as, bs, bands)).as("bk"))
    val candidates = banded.as("x").join(banded.as("y"),
        col("x.bk") === col("y.bk") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
    verifyJaccard(docs, candidates, n, threshold)
  }

  /** Exact Jaccard for a candidate pair set: the pair list joins the
    * per-doc shingle ARRAYS (two plain doc_id equi-joins — the corpus
    * is scanned but never exploded into index rows, unlike the
    * round-1 shape that paid a corpus-wide explode+shuffle twice),
    * then one `array_intersect` per pair. `pairs` must appear exactly
    * once in this tree: every extra reference to an unmaterialized
    * candidate frame re-executes the whole candidate join upstream.
    */
  private def verifyJaccard(docs: DataFrame, pairs: DataFrame, n: Int, threshold: Double): DataFrame = {
    val withSh = docs.select(col("doc_id"), shingles(col("text"), n).as("sh"))
    pairs
      .join(withSh.select(col("doc_id").as("a"), col("sh").as("sha")), Seq("a"))
      .join(withSh.select(col("doc_id").as("b"), col("sh").as("shb")), Seq("b"))
      .select(col("a"), col("b"),
        size(array_intersect(col("sha"), col("shb"))).cast("long").as("inter"),
        size(col("sha")).cast("long").as("na"), size(col("shb")).cast("long").as("nb"))
      .withColumn("jaccard", col("inter") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("a", "b", "jaccard")
  }

  // ---- SimHash ----

  /** 64-bit SimHash fingerprints: (doc_id, simhash: long) — bit b is
    * the sign of Σ±1 over shingle-hash bit b, computed per-doc in one
    * codegen'd pass ([[graft.functions.SimHash64Expr]]); zero shuffles
    * vs the equivalent explode + 64-sum-aggregate formulation.
    */
  def simhash(docs: DataFrame, n: Int = 3): DataFrame =
    docs.filter(hasShingles(n))
      .select(col("doc_id"),
        graft.functions.native.simhash64(shingles(col("text"), n)).as("simhash"))

  /** SimHash near-dups: hamming(a,b) ≤ maxHamming. Candidates via the
    * pigeonhole trick — split the 64-bit fingerprint into
    * maxHamming+1 chunks; any pair within distance maxHamming agrees
    * on ≥1 chunk — then verify with bit_count(a XOR b).
    */
  def simhashNearDups(docs: DataFrame, n: Int = 3, maxHamming: Int = 3): DataFrame = {
    val chunks = maxHamming + 1
    val width = 64 / chunks
    val fps = simhash(docs, n)
    val chunked = fps.select(
      col("doc_id"), col("simhash"),
      explode(array((0 until chunks).map { j =>
        struct(lit(j).as("ck"),
          shiftright(col("simhash"), j * width)
            .bitwiseAND(lit((1L << width) - 1)).as("cv"))
      }: _*)).as("c"))
      .select(col("doc_id"), col("simhash"), col("c.ck"), col("c.cv"))
    chunked.as("x").join(chunked.as("y"),
        col("x.ck") === col("y.ck") && col("x.cv") === col("y.cv") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        col("x.simhash").as("ha"), col("y.simhash").as("hb"))
      .distinct()
      .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))))
      .filter(col("hamming") <= maxHamming)
      .select("a", "b", "hamming")
  }
}
