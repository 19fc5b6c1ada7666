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
  *  - Jaccard runs on per-shingle posting lists (one explode + one
  *    grouping shuffle, pairs generated inside each list) so cost is
  *    Σ df², not n²; `dfCap` drops ultra-common shingles, the
  *    standard guard against quadratic blowup on boilerplate
  *    shingles at scale;
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
    keepFirstByKey(df.withColumn("dedup_key", key), idCol)

  /** Shared keep-first tail: one surviving row (smallest id) per
    * distinct `dedup_key`, with its duplicate count. */
  private def keepFirstByKey(keyed: DataFrame, idCol: String): DataFrame =
    keyed.groupBy("dedup_key")
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_dups"))
      .select(idCol, "dedup_key", "n_dups")

  /** Incremental exact dedup — the every-crawl-cycle operation on a
    * growing corpus: drop incoming rows whose content key already
    * exists in the CATALOG (the previously-accepted corpus), then
    * dedup within the increment itself (smallest id survives, as
    * [[exact]]). Returns (id, dedup_key, n_dups) for the surviving
    * increment rows. The catalog ships only DISTINCT keys into the
    * anti-join — at 100 TB pass a content HASH as `key` so the wire
    * carries 16 bytes/doc, and put a Bloom filter of catalog keys in
    * front (cf. [[Contamination.flagBloom]]) when the increment is
    * tiny relative to the catalog: most probes then never shuffle.
    */
  def incrementalDedup(incoming: DataFrame, catalog: DataFrame, key: Column,
                       idCol: String = "doc_id"): DataFrame =
    keepFirstByKey(
      incoming.withColumn("dedup_key", key)
        .join(catalog.select(key.as("dedup_key")).distinct(), Seq("dedup_key"), "left_anti"),
      idCol)

  /** Scale variant of [[incrementalDedup]] (docs/SCALE.md switch
    * table): a Bloom filter of the catalog keys screens the increment
    * BEFORE the anti-join. Bloom filters have no false negatives, so
    * rows failing the probe are DEFINITELY new and never enter the
    * shuffle; only the maybe-duplicate sliver (true dups + fpp noise)
    * rides the exact anti-join. The result is therefore bit-identical
    * to the exact form — the switch changes wire volume, not answers —
    * which is why q_incr_dedup_bloom shares q_incr_dedup's oracle.
    * Pays off when the increment ≪ catalog: most probes answered
    * executor-locally against constant-size filter bits.
    */
  def incrementalDedupBloom(incoming: DataFrame, catalog: DataFrame, key: Column,
                            idCol: String = "doc_id",
                            expectedKeys: Long = 1000000L,
                            fpp: Double = 0.01): DataFrame = {
    // drop NULL catalog keys up front: bloom_filter_agg skips nulls
    // anyway (an all-null catalog would otherwise build a zero-item
    // filter and NPE just like an empty one), and a null key never
    // matches the anti-join, so excluding it preserves semantics
    val catKeys = catalog.select(key.as("dedup_key")).filter(col("dedup_key").isNotNull)
    // an EMPTY (or all-null-key) catalog — the first crawl cycle! —
    // NPEs Spark's bloomFilter builder, and needs no screening at
    // all: fall back to the exact form, whose anti-join against
    // nothing is a no-op
    if (catKeys.isEmpty) return incrementalDedup(incoming, catalog, key, idCol)
    // no distinct() before the build: Bloom insertion is idempotent
    // (same rationale as Contamination.flagBloom)
    val bf = catKeys.stat.bloomFilter("dedup_key", expectedKeys, fpp)
    val keyed = incoming.withColumn("dedup_key", key)
    // null-safe probe: a NULL key makes bloomMightContain NULL, which
    // both filter branches would drop — but the exact form's anti-join
    // KEEPS null-key rows (null never matches the catalog), so they
    // must land on the definitely-new side to preserve bit-identity
    val probe = coalesce(
      graft.functions.native.bloomMightContain(col("dedup_key"), bf), lit(false))
    val maybeDup = keyed.filter(probe)
      .join(catKeys.distinct(), Seq("dedup_key"), "left_anti")
    val definitelyNew = keyed.filter(!probe)
    keepFirstByKey(maybeDup.unionByName(definitelyNew), idCol)
  }

  /** Cross-corpus near-dup pairs between an id-disjoint catalog
    * (ids < `incomingMinId`) and an increment (ids ≥): the near-dup
    * sibling of [[incrementalDedup]] — the crawl-cycle question is
    * rarely "byte-identical?" but "near-duplicate of something we
    * already have?". Pairs come from the SAME one-explode group-pairs
    * build as [[ngramJaccardPairs]] restricted to cross pairs
    * (a in catalog, b in increment — the a < b order gives this for
    * free on id-disjoint corpora). At the scale where exact Σdf²
    * pair work stops fitting, swap the pair source for
    * [[minhashNearDups]] and keep the same filter — the decision
    * logic is unchanged (docs/SCALE.md switch table).
    */
  def crossNearDupPairs(all: DataFrame, incomingMinId: Long, n: Int = 3,
                        threshold: Double = 0.8, dfCap: Option[Int] = None): DataFrame =
    ngramJaccardPairs(all, n, threshold, dfCap)
      .filter(col("a") < incomingMinId && col("b") >= incomingMinId)

  /** `size(split(text," ")) >= n` ⟺ the doc has ≥1 shingle, but costs
    * one split instead of the full shingle build — predicate pushdown
    * re-evaluates filter expressions per row, so the guard must be
    * cheaper than the projection it guards.
    */
  private def hasShingles(n: Int): Column = size(split(col("text"), " ")) >= n

  /** Exact n-gram Jaccard near-dup pairs: (a, b, jaccard) for
    * jaccard ≥ threshold, a < b. Deterministic — no hashing — so it
    * doubles as the verification oracle for the approximate variants.
    *
    * Shape (group-pairs, round-4): ONE corpus scan projecting each
    * doc's shingle array and its size, ONE explode into (doc_id, n, s)
    * rows, ONE shuffle grouping them into per-shingle posting lists of
    * (doc_id, n), then each list emits its (a < b) pairs — carrying
    * both set sizes — via a codegen kernel
    * ([[graft.functions.PostingPairsExpr]]), and pairs hash-aggregate
    * straight into (inter, na, nb). Zero joins. This replaces the
    * round-1..3 inverted-index SELF-join, which evaluated the
    * unmaterialized index once per join side (plus once for per-doc
    * counts, plus a fourth corpus scan for the df filter under dfCap)
    * — the corpus was exploded and shuffled up to 4×; now exactly
    * once. Total pair work is identical (Σ df² over shingles) but
    * arrives without any join, and the 8-byte size rider on each index
    * row is what buys the counts join away.
    *
    * `dfCap` drops posting lists longer than `cap` — the standard
    * guard against quadratic pair blowup on boilerplate shingles, and
    * in this shape it is FREE (a filter on the already-grouped list,
    * no separate counting pass or anti-join) and also bounds the
    * per-group kernel output, so a hot shingle cannot OOM a reduce
    * task at 100 TB. Capped semantics (changed in round 4, was
    * capped-universe-exact): the numerator is computed over the capped
    * shingle universe while denominators stay full-set, so the
    * reported jaccard is a LOWER BOUND of true jaccard for
    * boilerplate-heavy docs — conservative by construction: shared
    * boilerplate can never inflate similarity into a false near-dup,
    * and docs whose overlap is ONLY boilerplate stop pairing at all.
    *
    * `doc_id` must be LONG: the pair kernel packs (doc_id, n) structs
    * and orders pairs numerically. Corpora keyed by string/UUID ids
    * should assign surrogate longs first (e.g.
    * [[graft.ops.TotalOrder.globalIndex]]) and map back after —
    * checked eagerly here so the error names the fix instead of
    * surfacing as the kernel's analysis-time type mismatch.
    */
  def ngramJaccardPairs(docs: DataFrame, n: Int = 3, threshold: Double = 0.8,
                        dfCap: Option[Int] = None): DataFrame = {
    val idType = docs.schema("doc_id").dataType
    require(idType == org.apache.spark.sql.types.LongType,
      s"ngramJaccardPairs requires a LONG doc_id (got $idType); assign " +
        "surrogate long ids (TotalOrder.globalIndex) and join back after")
    pairCounts(docs, n, dfCap)
      .withColumn("jaccard", col("inter") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("a", "b", "jaccard")
  }

  /** The shared group-pairs structure behind [[ngramJaccardPairs]] and
    * [[ngramContainmentPairs]]: (a, b, inter, na, nb) for every doc
    * pair sharing ≥1 (surviving) shingle, a < b. See
    * [[ngramJaccardPairs]] for the shape and `dfCap` semantics.
    */
  private def pairCounts(docs: DataFrame, n: Int, dfCap: Option[Int]): DataFrame = {
    val postings = docs
      .select(col("doc_id"), shingles(col("text"), n).as("sh"))
      .select(col("doc_id"), size(col("sh")).cast("long").as("n"), explode(col("sh")).as("s"))
      .groupBy("s").agg(collect_list(struct(col("doc_id"), col("n"))).as("ids"))
      .filter(size(col("ids")) >= 2)
    val capped = dfCap.fold(postings)(cap => postings.filter(size(col("ids")) <= cap))
    capped
      .select(explode(graft.functions.native.postingPairs(col("ids"))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("inter"), min(col("p.na")).as("na"), min(col("p.nb")).as("nb"))
  }

  /** Asymmetric near-dup: shingle CONTAINMENT C(A,B) = |A∩B| / |A| —
    * the subset/quote detector Jaccard misses (a doc wholly embedded
    * in a much larger one scores low Jaccard but containment ~1).
    * Emits both directions per unordered pair (c_ab = inter/na,
    * c_ba = inter/nb), filtered on the larger of the two, so the
    * caller sees which side is the contained one. Same single-explode
    * group-pairs build, same `dfCap` guard, same cost as
    * [[ngramJaccardPairs]] — only the final scalar differs
    * (cf. Broder '97's resemblance vs containment).
    */
  def ngramContainmentPairs(docs: DataFrame, n: Int = 3, threshold: Double = 0.8,
                            dfCap: Option[Int] = None): DataFrame = {
    val idType = docs.schema("doc_id").dataType
    require(idType == org.apache.spark.sql.types.LongType,
      s"ngramContainmentPairs requires a LONG doc_id (got $idType); assign " +
        "surrogate long ids (TotalOrder.globalIndex) and join back after")
    pairCounts(docs, n, dfCap)
      .withColumn("c_ab", col("inter") / col("na"))
      .withColumn("c_ba", col("inter") / col("nb"))
      .filter(greatest(col("c_ab"), col("c_ba")) >= threshold)
      .select("a", "b", "c_ab", "c_ba")
  }

  /** Per-doc shingle NOVELTY: the fraction of a doc's distinct
    * shingles not seen in any earlier doc (by ascending doc_id) — the
    * crawl-cycle "is new content still arriving?" curve, and a
    * curriculum signal (novelty-dense docs first). Docs with zero
    * shingles (< n tokens) are absent, as in the pair builds.
    *
    * 100 TB shape: ONE corpus explode into thin (doc_id, s) rows,
    * consumed by a SINGLE linear pipeline — a per-shingle window min
    * tags each row with the first doc to carry that shingle, then one
    * doc-grain aggregate computes total and novel counts together.
    * Exactly two shuffles (by s, by doc_id), zero joins, and — because
    * nothing branches — no shared subtree to materialize, so the
    * operator needs no checkpoint policy at any scale. ([[shingles]]
    * dedupes per doc, so (doc_id, s) rows are unique and the window
    * form is row-for-row equivalent to the former first-seen-agg +
    * join shape; r9 A/B at sf0.1: 1.01 s two-consumer recompute /
    * 1.54 s two-consumer checkpointed / 0.60 s this.)
    */
  def shingleNovelty(docs: DataFrame, n: Int = 3): DataFrame = {
    val ex = docs
      .select(col("doc_id"), explode(shingles(col("text"), n)).as("s"))
    val firstSeen = org.apache.spark.sql.expressions.Window.partitionBy("s")
    ex.withColumn("first_doc", min(col("doc_id")).over(firstSeen))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_shingles"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L)).as("n_novel"))
      .select(col("doc_id"), col("n_shingles"), col("n_novel"),
        round(col("n_novel").cast("double") / col("n_shingles").cast("double"), 6)
          .as("novelty"))
  }

  /** SPLIT-LEAKAGE audit: near-duplicate pairs that STRADDLE a
    * train/val/test boundary — the pairs that silently inflate eval
    * scores (the val doc's near-twin was trained on). Dedup-then-split
    * prevents this by construction; this op is the AUDIT that proves
    * it held (or finds the leaks when splits were assigned upstream of
    * dedup, the common legacy mistake). One row per leaking pair:
    * (a, b, jaccard, split_a, split_b), split_a ≠ split_b, both from
    * the same deterministic hash assignment as
    * [[TextAnalysis.splitAssign]] — so the audit reproduces the exact
    * splits the pipeline shipped.
    *
    * Shape: the pair list (already collapsed to O(near-dup pairs) by
    * the Σdf²-bounded build) joins the thin (doc_id, split) assignment
    * twice — at 100 TB the assignment is a pure per-row expression on
    * the pair ids' own frame, so the two joins are id-grain and the
    * corpus text is never touched again. Swap the pair source for
    * [[minhashNearDups]] at the same switch point as everything else.
    */
  def splitLeakage(docs: DataFrame, n: Int = 3, threshold: Double = 0.8): DataFrame = {
    val splits = TextAnalysis.splitAssign(docs.select("doc_id")).select("doc_id", "split")
    ngramJaccardPairs(docs, n, threshold)
      .join(splits.select(col("doc_id").as("a"), col("split").as("split_a")), Seq("a"))
      .join(splits.select(col("doc_id").as("b"), col("split").as("split_b")), Seq("b"))
      .filter(col("split_a") =!= col("split_b"))
      .select("a", "b", "jaccard", "split_a", "split_b")
  }

  /** The keep/drop DECISION from near-dup pairs: drop every doc that
    * has a near-duplicate with a smaller doc_id (keep-first rule —
    * one anti-join against the pair list's `b` side). Not full
    * connected components: a chain a~b~c with a≁c keeps a and c,
    * which is the standard training-data choice (transitive merging
    * over-deletes). For the policy that DOES merge chains, see
    * [[nearDupClusters]] / [[dropNearDupsByCluster]].
    */
  def dropNearDups(docs: DataFrame, pairs: DataFrame, idCol: String = "doc_id"): DataFrame =
    docs.join(pairs.select(col("b").as(idCol)).distinct(), Seq(idCol), "left_anti")

  /** Connected components over the near-dup pair graph:
    * (id, cluster) where cluster = the smallest doc_id reachable
    * through near-dup pairs. Iterative min-label propagation — each
    * round joins labels to the edge list and keeps the per-node min
    * (one shuffle per round), converging in O(component diameter)
    * rounds with a driver-side convergence count. Near-dup components
    * are clique-ish (diameter 2-3), so rounds stay in single digits
    * regardless of corpus size; `localCheckpoint` truncates the plan
    * lineage each round so iteration N doesn't replan rounds 1..N-1.
    * For adversarial long-chain graphs the two-phase star algorithms
    * (Kiveris et al., "Connected Components in MapReduce and Beyond")
    * drop rounds to O(log n); not needed for near-dup workloads.
    * Only docs that appear in `pairs` are emitted — singletons are
    * their own cluster by definition.
    *
    * Size-aware hybrid: the near-dup edge list is O(#duplicate pairs)
    * AFTER thresholding — vastly smaller than the corpus it came from
    * (the expensive part, the pair build, has already collapsed 100 TB
    * of text into the few rows that actually matched). When that list
    * fits the driver (`maxLocalEdges`, counted on the one materialized
    * edge frame), clustering runs as driver-side union-find with path
    * halving — two jobs total (materialize + apply) instead of 2 jobs
    * PER propagation round. Same driver-side-when-small trade Spark
    * itself makes for broadcast joins. Larger graphs take the
    * distributed min-label loop below unchanged.
    */
  def nearDupClusters(pairs: DataFrame, maxRounds: Int = 20,
                      maxLocalEdges: Long = 2000000L): DataFrame = {
    // ONE materialization of the (expensive) pair build; everything
    // below — the size probe and both cluster paths — reads the
    // checkpointed half-edge list, never the pair plan again
    // unconditionally materialized (not Mat.matBoundary): the loop
    // below re-reads this frame every round, so un-materialized
    // recompute depth grows with the iteration count — the size gate's
    // "recompute ≈ 2× subtree" assumption does not hold for iterative
    // consumers (A/B at sf0.1: gated 2.46 s vs forced 1.31 s)
    val halfEdges = pairs.select(col("a").as("x"), col("b").as("y"))
      .localCheckpoint(true)
    if (halfEdges.count() <= maxLocalEdges) {
      val spark = pairs.sparkSession
      import scala.collection.mutable
      val parent = mutable.LongMap.empty[Long]
      def find(a: Long): Long = {
        var r = a
        while (parent.getOrElse(r, r) != r) {
          val p = parent(r); parent(r) = parent.getOrElse(p, p); r = parent(r)
        }
        r
      }
      halfEdges.collect().foreach { row =>
        val (ra, rb) = (find(row.getLong(0)), find(row.getLong(1)))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      // union-by-min makes every root the minimum of its component, so
      // find(id) IS the min-label-propagation cluster id
      val nodes = (parent.keys ++ parent.values).toArray.distinct
      val labels = nodes.map(id => (id, find(id)))
      return spark.createDataFrame(labels.toSeq).toDF("id", "cluster")
    }
    // pairs are unique (a < b) by construction, so the directed union
    // is duplicate-free — a distinct() here would be a full extra
    // shuffle of the edge list for nothing (and duplicate edges could
    // not change a min() anyway)
    val edges = halfEdges
      .unionByName(halfEdges.select(col("y").as("x"), col("x").as("y")))
      .localCheckpoint(true)
    // fused round 0: initial labels ARE the ids, so the first
    // propagation needs no label join — label = min(own, min neighbor)
    // in one aggregate. Saves a full join+agg+join round.
    var labels = edges.groupBy("x").agg(min(col("y")).as("__m"))
      .select(col("x").as("id"), least(col("x"), col("__m")).as("cluster"))
      .localCheckpoint(true)
    var round = 1
    var changed = 1L
    while (changed > 0 && round < maxRounds) {
      val neighborMin = edges
        .join(labels.select(col("id").as("y"), col("cluster").as("ycl")), Seq("y"))
        .groupBy("x").agg(min(col("ycl")).as("ncl"))
      val next = labels
        .join(neighborMin.select(col("x").as("id"), col("ncl")), Seq("id"), "left")
        .select(col("id"),
          least(col("cluster"), coalesce(col("ncl"), col("cluster"))).as("cluster"),
          (coalesce(col("ncl"), col("cluster")) < col("cluster")).as("__chg"))
        .localCheckpoint(true)
      changed = next.filter(col("__chg")).count()
      labels = next.select("id", "cluster")
      round += 1
    }
    // silently returning non-converged labels would split a long-diameter
    // component into several clusters and make the keep/drop policy
    // under-delete with no signal — fail loudly instead; near-dup graphs
    // converge in single digits, so hitting this means maxRounds is wrong
    // for the graph (raise it, or use a log-round star algorithm)
    require(changed == 0,
      s"nearDupClusters did not converge after $maxRounds rounds " +
        s"($changed labels still changing); raise maxRounds")
    labels
  }

  /** Cluster keep/drop policy: ONE survivor (the smallest doc_id) per
    * connected component — the transitive-merge alternative to
    * [[dropNearDups]]'s keep-first rule: a chain a~b~c with a≁c keeps
    * only a here (keep-first keeps a and c). Anti-join against the
    * non-minimum members; docs outside the pair graph are untouched.
    */
  def dropNearDupsByCluster(docs: DataFrame, pairs: DataFrame,
                            idCol: String = "doc_id"): DataFrame = {
    val dropped = nearDupClusters(pairs)
      .filter(col("id") =!= col("cluster"))
      .select(col("id").as(idCol))
    docs.join(dropped, Seq(idCol), "left_anti")
  }

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

  /** The ENGINE-PORTABLE MinHash companion (VERDICT r8 #6): same
    * banding/bucket/verify logic as [[minhashNearDups]], but the base
    * shingle hash is derived from md5 — computable bit-identically by
    * any engine (md5 is specified; xxhash64's seed/variant is not), so
    * this variant's output hash-matches a DuckDB recomposition and
    * pins the LSH construction cross-engine. Construction, fixed by
    * contract with the q_dedup_minhash_md5 oracle:
    * base h = toLong(first 15 hex chars of md5(shingle)) mod P,
    * P = 2^31−1; 8 universal hashes m_i = min((a_i·h + b_i) mod P)
    * (params in [[Md5MinhashParams]] — all < P, so products stay under
    * 2^62 and overflow semantics never diverge between engines);
    * 4 bands × 2 rows, band key = "m_{2k},m_{2k+1}"; candidates from
    * band-key equality, then exact-Jaccard verified like every other
    * pair source (precision 1.0 — only recall is probabilistic, and
    * at j=0.8 detection is 1−(1−0.64)⁴ ≈ 0.983 per true pair).
    *
    * Scale note: one corpus explode + one groupBy — the same
    * Σ-bounded shape as the xxhash64 kernel path, minus the
    * zero-shuffle signature expression; keep [[minhashNearDups]] as
    * the performance path and this as the cross-engine-verifiable one.
    */
  val Md5MinhashParams: Seq[(Long, Long)] = Seq(
    (1103515245L, 12345L), (1588635695L, 179426549L),
    (784588716L, 899809343L), (894847L, 49979687L),
    (982451653L, 32452843L), (472882027L, 86028121L),
    (1500450271L, 694847539L), (198491317L, 15485863L))

  def minhashNearDupsMd5(docs: DataFrame, n: Int = 3, threshold: Double = 0.8): DataFrame = {
    val P = 2147483647L
    val ex = docs.filter(hasShingles(n))
      .select(col("doc_id"), explode(shingles(col("text"), n)).as("s"))
    val h = conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long") % P
    val hashed = ex.select(col("doc_id"), h.as("h"))
    val sigCols = Md5MinhashParams.zipWithIndex.map { case ((a, b), i) =>
      min((col("h") * a + b) % P).as(s"m$i")
    }
    val sig = hashed.groupBy("doc_id").agg(sigCols.head, sigCols.tail: _*)
    val bandCols = (0 until 4).map { k =>
      struct(lit(k).as("band"),
        concat_ws(",", col(s"m${2 * k}"), col(s"m${2 * k + 1}")).as("bk"))
    }
    val banded = sig.select(col("doc_id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bk").as("bk"))
    val candidates = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bk") === col("y.bk") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
    verifyJaccard(docs, candidates, n, threshold)
  }

  /** The ENGINE-PORTABLE SimHash companion — [[minhashNearDupsMd5]]'s
    * move applied to the SimHash family: same pigeonhole banding and
    * exact hamming verify as [[simhashNearDups]], but the fingerprint
    * construction is fixed by md5 so any engine recomposes it
    * bit-identically and the full pipeline hash-matches a DuckDB
    * recomposition (q_dedup_simhash_md5), leaving the xxhash64 kernel
    * path as the performance variant. Construction, by contract with
    * the oracle: base h = toLong(first 15 hex chars of md5(shingle)) —
    * a 60-bit value, so every shift stays inside a signed long in both
    * engines; vote_j = Σ over the doc's DISTINCT shingles of ±1 on
    * hash bit j; fingerprint bit j = 1 iff vote_j > 0 (tie → 0);
    * 4 bands × 15 bits — pigeonhole-EXACT for hamming ≤ 3 (a pair
    * within 3 flips agrees on ≥1 of 4 bands), so unlike the MinHash
    * LSH this variant's recall is 1.0 at the default threshold, not
    * probabilistic.
    *
    * Shape: one corpus explode → ONE doc-grain hash-agg carrying 60
    * codegen'd ±1 sums (the fingerprint never leaves the aggregate as
    * per-bit rows) → 4 thin band rows per doc → band-bucket equi-join
    * → exact `bit_count(xor)` verify on the fingerprint pairs.
    */
  def simhashNearDupsMd5(docs: DataFrame, n: Int = 3, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4x15-bit banding is pigeonhole-exact only for maxHamming <= 3")
    val ex = docs.filter(hasShingles(n))
      .select(col("doc_id"), explode(shingles(col("text"), n)).as("s"))
    val h = conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long")
    val hashed = ex.select(col("doc_id"), h.as("h"))
    val voteCols = (0 until 60).map { j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(lit(1L)) === 1L, 1L)
        .otherwise(-1L)).as(s"v$j")
    }
    val votes = hashed.groupBy("doc_id").agg(voteCols.head, voteCols.tail: _*)
    val fp = (0 until 60).map { j =>
      when(col(s"v$j") > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    val fps = votes.select(col("doc_id"), fp.as("f"))
    val bandCols = (0 until 4).map { k =>
      struct(lit(k).as("band"),
        shiftright(col("f"), k * 15).bitwiseAND(lit(32767L)).as("bk"))
    }
    val banded = fps.select(col("doc_id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bk").as("bk"))
    val candidates = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bk") === col("y.bk") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b")).distinct()
    candidates
      .join(fps.select(col("doc_id").as("a"), col("f").as("fa")), Seq("a"))
      .join(fps.select(col("doc_id").as("b"), col("f").as("fb")), Seq("b"))
      .withColumn("hamming", bit_count(col("fa").bitwiseXOR(col("fb"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("a", "b", "hamming")
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
    * on ≥1 chunk.
    *
    * Shape (group-pairs, round-6 — the same rework the ngram family
    * got in round 4): one chunk explode (maxHamming+1 thin rows per
    * doc), ONE shuffle grouping (chunk, value) buckets, then each
    * bucket's (doc_id, simhash) list emits its verified pairs inside a
    * codegen kernel ([[graft.functions.SimhashBucketPairsExpr]]) —
    * hamming is checked in-kernel AND cross-bucket duplicates are
    * eliminated by the first-agreeing-chunk rule (a pair within
    * distance k agrees on ≥1 of the k+1 chunks; only the smallest
    * agreeing chunk's bucket owns it). This replaces the chunked
    * SELF-join + candidate-wide `distinct` — which paid a second
    * explode evaluation on the join's probe side plus a full shuffle
    * of every candidate pair — with zero joins and zero post-shuffles:
    * pair work is still Σ bucket² (pigeonhole cost at any scale), but
    * no candidate row ever crosses the wire.
    */
  def simhashNearDups(docs: DataFrame, n: Int = 3, maxHamming: Int = 3): DataFrame = {
    val chunks = maxHamming + 1
    val width = 64 / chunks
    val fps = simhash(docs, n)
    fps.select(
        col("doc_id"), col("simhash"),
        explode(array((0 until chunks).map { j =>
          struct(lit(j).as("ck"),
            shiftright(col("simhash"), j * width)
              .bitwiseAND(lit((1L << width) - 1)).as("cv"))
        }: _*)).as("c"))
      .groupBy(col("c.ck").as("ck"), col("c.cv").as("cv"))
      .agg(collect_list(struct(col("doc_id"), col("simhash"))).as("ids"))
      .filter(size(col("ids")) >= 2)
      .select(explode(graft.functions.native.simhashBucketPairs(
        col("ids"), col("ck"), width, maxHamming)).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"), col("p.hamming").as("hamming"))
  }

  /** Substring-level duplication profile (Lee et al. '22,
    * "Deduplicating Training Data Makes Language Models Better"): for
    * each document, the fraction of its distinct `w`-token windows
    * that also occur in ANOTHER document — the signal behind
    * remove-duplicated-substring policies, at window rather than
    * whole-document grain (catches boilerplate headers, licence
    * blocks, syndicated paragraphs that whole-doc near-dup misses).
    *
    * Shape (one corpus pass, group-pairs discipline): per-row
    * [[graft.functions.WindowHashesExpr]] O(tokens) rolling hashes →
    * ONE explode of per-doc DISTINCT hashes (thin (doc_id, h) longs on
    * the wire) → ONE grouping shuffle on h building each window's doc
    * list → lists with 2 ≤ df ≤ dfCap explode back (only duplicated
    * windows — typically a tiny fraction of the corpus) → doc-grain
    * count. No self-join, no pair explosion (df lists are linear in
    * postings; nothing quadratic exists here). `dfCap` drops
    * ultra-common boilerplate windows, same guard as the ngram
    * family's dfCap; capped windows are CORPUS-frequent, so flagging
    * them per-doc would only re-rank universally-shared boilerplate.
    *
    * Returns (doc_id, n_windows, n_distinct, dup_windows,
    * dup_fraction) — dup_fraction over distinct windows. Docs shorter
    * than w tokens have zero windows and dup_fraction 0.
    */
  def duplicateSpans(docs: DataFrame, w: Int = 8, dfCap: Int = 1000,
                     idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // ONE evaluation of the rolling-hash kernel: per-doc stats ride the
    // exploded rows (group-pairs discipline — the ngram family's r2
    // lesson: an unmaterialized index referenced from two plan branches
    // re-evaluates the whole corpus scan per branch). explode_outer
    // keeps sub-w-token docs (null h → never df-counted as duplicated).
    val ex = docs.select(col(idCol),
        graft.functions.native.windowHashes(col(textCol), w).as("wh"))
      .select(col(idCol), size(col("wh")).cast("long").as("n_windows"),
        array_distinct(col("wh")).as("whd"))
      .select(col(idCol), col("n_windows"),
        size(col("whd")).cast("long").as("n_distinct"),
        explode_outer(col("whd")).as("h"))
    // shuffle 1: each window's doc list (df ≤ list size, linear — no
    // pair explosion anywhere); shuffle 2: doc grain. Each distinct
    // (doc, window) crosses the wire once per shuffle as 4 scalars.
    // hsalt: sub-w docs (h null) must NOT collapse into one giant
    // null-key group — each gets its own singleton group.
    ex.groupBy(col("h"),
        when(col("h").isNull, col(idCol)).otherwise(lit(0L)).as("hsalt"))
      .agg(collect_list(struct(col(idCol), col("n_windows"), col("n_distinct"))).as("docs"))
      .select((col("h").isNotNull && size(col("docs")).between(2, dfCap)).as("is_dup"),
        explode(col("docs")).as("d"))
      .groupBy(col(s"d.$idCol").as(idCol))
      .agg(first(col("d.n_windows")).as("n_windows"),
        first(col("d.n_distinct")).as("n_distinct"),
        sum(when(col("is_dup"), 1L).otherwise(0L)).as("dup_windows"))
      .withColumn("dup_fraction",
        when(col("n_distinct") > 0,
          col("dup_windows").cast("double") / col("n_distinct")).otherwise(lit(0.0)))
  }

  /** Corpus-wide passage dedup — the REWRITE member of the family
    * (C4's three-sentence-span rule, RefinedWeb's line dedup, both at
    * a fixed k-word chunk grain): every document is cut into
    * consecutive k-token chunks, each distinct chunk survives at its
    * FIRST corpus occurrence only (ordered by (doc_id, chunk_idx) —
    * intra-doc repeats dedup under the same rule), and each document
    * is reassembled from its surviving chunks in original order. This
    * is what strips boilerplate headers/footers and licence blocks
    * that repeat across a crawl WITHOUT dropping the documents that
    * carry them — [[exact]]/[[minhashNearDups]] decide which DOCS
    * die; this decides which PASSAGES do.
    *
    * Returns (doc_id, n_chunks, n_kept, text_deduped) — every input
    * doc kept, `text_deduped` empty when all its chunks lost.
    *
    * Scale shape: chunk grain throughout, never pairs. One shuffle
    * partitioned on the chunk text for the keep-first window (the
    * text must cross the wire once anyway — reassembly needs it),
    * one doc-grain shuffle to rebuild; both linear in corpus size.
    * Spark's range-partitions the window on the chunk itself, so
    * boilerplate-heavy corpora skew a partition only when ONE chunk
    * value dominates — exact-key grouping cannot salt without
    * breaking the global first-occurrence rule, but the per-group
    * state is one row_number counter, so a hot group costs wire, not
    * memory. The decision is exact (no hashing), so the output is
    * engine-portable — the DuckDB oracle recomposes it in full.
    */
  def passageDedup(docs: DataFrame, k: Int = 16, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    val toks = split(coalesce(col(textCol), lit("")), " ")
    val nc = ceil(size(toks) / lit(k.toDouble)).cast("int")
    val ch = docs.select(col(idCol),
      posexplode(transform(sequence(lit(0), nc - 1),
        i => array_join(slice(toks, i * k + 1, lit(k)), " "))).as(Seq("idx", "chunk")))
    val firstWin = org.apache.spark.sql.expressions.Window
      .partitionBy(col("chunk")).orderBy(col(idCol), col("idx"))
    ch.withColumn("keep", row_number().over(firstWin) === 1)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        array_join(transform(
          filter(sort_array(collect_list(struct(col("idx"), col("keep"), col("chunk")))),
            s => s.getField("keep")),
          s => s.getField("chunk")), " ").as("text_deduped"))
  }
}
