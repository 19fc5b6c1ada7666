package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance (Levenshtein) similarity join without the cross
  * product, via deletion-neighborhood blocking (the SymSpell scheme,
  * public: Garbe 2012; same pigeonhole family as the SimHash chunk
  * join). For every string emit the set of strings reachable by
  * deleting up to `k` characters; if `ed(a, b) <= k` then walking one
  * optimal alignment and deleting from `a` its substituted/deleted
  * characters and from `b` its substituted/inserted characters lands
  * both on the SAME string with at most `k` deletions each — so every
  * true pair shares at least one variant and blocking is
  * recall-complete. Candidates then verify with the exact
  * `levenshtein` (codegen built-in), so precision is 1.0.
  *
  * Cost shape at 100 TB: the explode is `O(rows × len^k)` thin
  * (variant, id) rows, the self-join is an EQUI-join on the variant —
  * Σ bucket² candidate pairs instead of n² — and the verify touches
  * candidates only. The all-pairs alternative is a
  * BroadcastNestedLoopJoin that never survives past one executor's
  * memory. `k` beyond 2 explodes the neighborhood (len² variants per
  * string at k=2 is the practical ceiling — cf. PassJoin-style
  * segment filters for larger k).
  */
object FuzzyJoin {

  /** delete-one-char variants of every string in `vs` (array column). */
  private def deleteOne(vs: Column): Column =
    array_distinct(flatten(transform(vs, s =>
      when(length(s) > 0,
        transform(sequence(lit(1), length(s)), i =>
          concat(s.substr(lit(1), i - 1), s.substr(i + 1, length(s)))))
        .otherwise(array(s)))))

  /** All (a < b) id pairs whose strings are within Levenshtein
    * distance `k`, as (a, b, dist). Identical strings pair at dist 0.
    * `idCol` must be orderable and unique per string row.
    */
  def editDistancePairs(df: DataFrame, idCol: String, strCol: String,
                        k: Int = 1): DataFrame = {
    require(k >= 1 && k <= 2, s"k must be 1 or 2 (neighborhood is len^k per string), got $k")
    var variants = array(col(strCol))
    for (_ <- 1 to k) variants = array_distinct(concat(variants, deleteOne(variants)))
    // the candidate join carries ONLY (id, hash64(variant)): the bucket
    // join and the pair dedup shuffle fixed-width 16-byte rows instead
    // of variant strings, and the strings re-attach to the surviving
    // distinct pairs afterwards (two joins against the input, broadcast
    // when it is small). Carrying both strings through the Σ bucket²
    // candidate explosion was measured 4× slower at sf0.1; hashing the
    // variant key a further ~15% faster. A 64-bit hash collision can
    // only ADD a candidate pair, never lose one, and the exact
    // levenshtein verify removes it — exactness is preserved.
    // group-pairs, not a self-join: bucket the (key, id) rows per
    // variant key and emit each bucket's (a < b) pairs via the
    // PostingPairsExpr kernel (n rides as 0 — unused here), then one
    // hash-agg dedups pairs that share several variants. The previous
    // equi-self-join evaluated the variant explode ONCE PER SIDE
    // (ReuseExchange does not fire across the differently-aliased
    // projections) and needed a third shuffle for the pair distinct;
    // this shape explodes once, shuffles the thin rows once, and the
    // pair dedup doubles as the aggregate (measured 2.15 → 1.89 s at
    // sf0.1, identical output; the residual cost is the candidate
    // verify itself, which both shapes pay).
    val v = df.select(col(idCol),
      explode(transform(variants, x => xxhash64(x))).as("__key"))
    val cand = v
      .groupBy("__key")
      .agg(collect_list(struct(col(idCol).as("doc_id"), lit(0L).as("n"))).as("ids"))
      .filter(size(col("ids")) >= 2)
      .select(explode(graft.functions.native.postingPairs(col("ids"))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)))
      .select("a", "b")
    val strs = df.select(col(idCol), col(strCol))
    cand
      .join(strs.select(col(idCol).as("a"), col(strCol).as("__sa")), Seq("a"))
      .join(strs.select(col(idCol).as("b"), col(strCol).as("__sb")), Seq("b"))
      // threshold form early-exits the DP row once the distance is
      // provably > k (returns -1), so the verify is O(k·len) not O(len²)
      .withColumn("dist", levenshtein(col("__sa"), col("__sb"), k).cast("long"))
      .filter(col("dist") >= 0)
      .select("a", "b", "dist")
  }
}
