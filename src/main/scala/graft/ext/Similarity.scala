package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (array<float>) — the
  * north-star ANN extension.
  *
  *  - `bruteForceTopK` is the exact baseline: broadcast the (small)
  *    query set against the corpus, one pass, no shuffle of the
  *    corpus. At 100 TB the corpus side stays partition-parallel and
  *    the top-k reduction is a partial aggregate per partition.
  *  - `lshTopK` is the scale path: random-hyperplane LSH buckets the
  *    corpus by sign-bit signature; queries probe their own bucket
  *    plus all hamming-1 neighbors (multiprobe), then rerank exactly.
  *    Cuts scored candidates by ~2^bits/ (1+bits) while keeping
  *    recall high on angularly-clustered data (Charikar '02).
  *
  * All arithmetic is double-accumulated in list order so results are
  * reproducible and comparable against the DuckDB oracle bit-for-bit.
  */
object Similarity {

  /** Sequential-order double dot product of two float arrays — a
    * native codegen expression ([[graft.functions.DotProductF]]);
    * bit-identical to `aggregate(zip_with(a, b, (x,y) => x*y), 0D, +)`
    * (same left-to-right double accumulation) at a fraction of the
    * per-element cost.
    */
  def dot(a: Column, b: Column): Column = graft.functions.native.dotF(a, b)

  def l2norm(a: Column): Column = sqrt(graft.functions.native.dotF(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  /** Exact top-k neighbors for each query vector. Queries are
    * broadcast (small side); corpus is never shuffled until the final
    * per-query top-k, which ranks only |queries|·|corpus| scored rows
    * pre-filtered to k by the window.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int = 10): DataFrame = {
    // norms precomputed per side — one pass each, not one per pair
    val q = broadcast(queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"),
      l2norm(col("embedding")).as("qn")))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"),
      l2norm(col("embedding")).as("cn"))
    val scored = q.crossJoin(c)
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("sim"))
    val w = Window.partitionBy("query_id").orderBy(desc("sim"), asc("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "sim")
  }

  /** Deterministic random hyperplanes: `bits` unit-free Gaussian
    * vectors of dimension `dim`, seeded — identical across runs and
    * executors (generated on the driver, shipped as literals).
    */
  private def hyperplanes(bits: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(bits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-bit signature of an embedding under the hyperplanes —
    * one codegen'd pass over all planes
    * ([[graft.functions.HyperplaneSigExpr]]).
    */
  private def signature(v: Column, planes: Array[Array[Double]]): Column =
    graft.functions.native.hyperplaneSig(v, planes)

  /** Approximate top-k via multi-table LSH + exact rerank. One hash
    * table has vanishing recall for moderate-angle neighbors, so the
    * standard construction is L independent tables of `bits`
    * hyperplanes each: a pair is a candidate if it collides in ANY
    * table (own bucket or a hamming-1 multiprobe bucket); candidates
    * are deduped, then scored exactly. With 8×8-bit tables this scores
    * ~25% of the corpus per query on isotropic random vectors (≈4×
    * pruning) at recall ~0.75 — on real clustered embeddings the
    * bucket skew works in our favor and pruning is far stronger.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int = 10,
              bits: Int = 8, tables: Int = 8, dim: Int = 64): DataFrame = {
    val allPlanes = (0 until tables).map(t => hyperplanes(bits, dim, seed = 42L + t)).toArray
    // corpus row → one packed (table<<32 | bucket) key per table
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"),
      explode(graft.functions.native.lshKeys(col("embedding"), allPlanes, multiprobe = false)).as("tb"))
    // query row → own bucket + hamming-1 probes, per table
    val probes = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"),
      l2norm(col("embedding")).as("qn"),
      explode(graft.functions.native.lshKeys(col("embedding"), allPlanes, multiprobe = true)).as("tb"))
    val candidates = broadcast(probes).join(c, Seq("tb"))
    // score first (cheap native dot), dedupe after — the dedup shuffle
    // then moves 3 scalar columns instead of two 64-float arrays
    val scored = candidates.select(col("query_id"), col("neighbor_id"),
      (dot(col("qv"), col("cv")) / (col("qn") * l2norm(col("cv")))).as("sim"))
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy("query_id").orderBy(desc("sim"), asc("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "sim")
  }

  /** Approximate top-k via IVF (inverted-file) coarse quantization:
    * corpus vectors are bucketed by nearest centroid; each query
    * probes its `nprobe` nearest cells and reranks exactly. Scored
    * work drops to ~nprobe/nlist of the corpus per query. Centroids:
    * deterministic seeds (lowest vec_ids) + one Lloyd refinement pass
    * (posexplode + per-dimension mean — a single shuffle of
    * nlist × dim cells). At 100 TB the centroid fit runs on a sample
    * and the assignment pass stays a single scan.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int = 10,
              nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    def normalize(vs: Array[Array[Double]]): Array[Array[Double]] =
      vs.map { v =>
        val n = math.sqrt(v.map(x => x * x).sum)
        if (n == 0) v else v.map(_ / n)
      }
    def collectCents(df: DataFrame): Array[Array[Double]] =
      df.collect().map(_.getSeq[Float](1).map(_.toDouble).toArray)
    val seeds = normalize(collectCents(
      corpus.select(col("vec_id"), col("embedding")).orderBy("vec_id").limit(nlist)))
    // one refinement pass: mean of assigned vectors per (cell, dim)
    val probe1 = graft.functions.native.centroidProbes(col("embedding"), seeds, 1)
    val means = corpus
      .select(element_at(probe1, 1).as("cell"), posexplode(col("embedding")))
      .groupBy("cell", "pos").agg(avg("col").as("m"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
    val refined = seeds.clone()
    means.groupBy(_._1).foreach { case (cell, xs) =>
      val v = new Array[Double](xs.map(_._2).max + 1)
      xs.foreach { case (_, pos, m) => v(pos) = m }
      refined(cell) = v
    }
    val cents = normalize(refined)
    val assign1 = graft.functions.native.centroidProbes(col("embedding"), cents, 1)
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"),
      element_at(assign1, 1).as("cell"))
    val probes = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"),
      l2norm(col("embedding")).as("qn"),
      explode(graft.functions.native.centroidProbes(col("embedding"), cents, nprobe)).as("cell"))
    val scored = broadcast(probes).join(c, Seq("cell"))
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("qv"), col("cv")) / (col("qn") * l2norm(col("cv")))).as("sim"))
    val w = Window.partitionBy("query_id").orderBy(desc("sim"), asc("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "sim")
  }

  /** All near-duplicate embedding pairs with cosine ≥ threshold
    * (a < b). Brute force at test scale; at 100 TB, bucket with
    * `lshTopK`'s signatures first.
    */
  def embeddingNearDups(embeddings: DataFrame, threshold: Double): DataFrame = {
    val n = embeddings.select(col("vec_id"), col("embedding"),
      l2norm(col("embedding")).as("nm"))
    val a = n.select(col("vec_id").as("a"), col("embedding").as("va"), col("nm").as("na"))
    val b = n.select(col("vec_id").as("b"), col("embedding").as("vb"), col("nm").as("nb"))
    a.join(b, col("a") < col("b"))
      .select(col("a"), col("b"),
        (dot(col("va"), col("vb")) / (col("na") * col("nb"))).as("sim"))
      .filter(col("sim") >= threshold)
  }
}
