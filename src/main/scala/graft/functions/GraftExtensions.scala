package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL-surface registration of the native expressions, so
  * `spark.sql("SELECT dot_f(a, b) …")` works alongside the Column
  * API. Two entry points:
  *
  *  - `spark.sql.extensions=graft.functions.GraftExtensions` at
  *    session build (the SparkSessionExtensions injection path);
  *  - `Registry.registerAll(spark)` on an already-live session.
  *
  * Driver-side parameters (hash counts, seeds) are SQL literal
  * arguments resolved at plan time.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    Registry.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    TableFunctions.functions.foreach { case (name, info, builder) =>
      ext.injectTableFunction((FunctionIdentifier(name), info, builder))
    }
  }
}

object Registry {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
  }

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[Registry.type].getName, null, name, usage, "")

  /** (name, info, builder) for every SQL-exposed native function. */
  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("dot_f", info("dot_f", "dot_f(a, b) - sequential double dot product of two numeric arrays"),
      (es: Seq[Expression]) => DotProductF(es(0), es(1))),
    ("word_shingles", info("word_shingles", "word_shingles(text, n) - distinct lowercased word n-gram shingles"),
      (es: Seq[Expression]) => WordShinglesExpr(es(0), intLit(es(1), "n"))),
    ("normalize_text", info("normalize_text", "normalize_text(text) - lowercase, trim, collapse spaces, drop adjacent repeated tokens"),
      (es: Seq[Expression]) => NormalizeTextExpr(es(0))),
    ("word_ngrams", info("word_ngrams", "word_ngrams(text, n) - ALL lowercased word n-grams in order, repeats kept"),
      (es: Seq[Expression]) => WordNgramsExpr(es(0), intLit(es(1), "n"))),
    ("token_counts", info("token_counts", "token_counts(text) - per-document (token, tf) pairs in first-seen order"),
      (es: Seq[Expression]) => TokenCountsExpr(es(0))),
    ("simhash64", info("simhash64", "simhash64(shingles) - 64-bit SimHash fingerprint"),
      (es: Seq[Expression]) => SimHash64Expr(es(0))),
    ("minhash_sig", info("minhash_sig", "minhash_sig(shingles, numHashes, seed) - MinHash signature array"),
      (es: Seq[Expression]) => {
        val k = intLit(es(1), "numHashes")
        val seed = if (es.length > 2) intLit(es(2), "seed").toLong else 42L
        val (as, bs) = Kernels.minhashParams(k, seed)
        MinHashSigExpr(es(0), as, bs)
      }),
    ("posting_pairs", info("posting_pairs",
      "posting_pairs(array<struct<doc_id,n>>) - all (a < b) pairs of a posting list with both set sizes"),
      (es: Seq[Expression]) => PostingPairsExpr(es(0))),
    ("repetition_stats", info("repetition_stats",
      "repetition_stats(text) - (n_tokens, n_distinct, top_cnt, n_distinct_bigrams) in one pass"),
      (es: Seq[Expression]) => RepetitionStatsExpr(es(0))),
    ("seeded_ewma", info("seeded_ewma",
      "seeded_ewma(x, alpha, seedPeriods) OVER (... ROWS UNBOUNDED PRECEDING) - " +
        "recursive EWMA window function; seedPeriods=1 seeds on the first value (pandas " +
        "ewm adjust=False), n seeds on the mean of the first n (Wilder)"),
      (es: Seq[Expression]) => {
        val alpha = es(1) match {
          case Literal(v: Double, _) => v
          case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
          case other => throw new IllegalArgumentException(
            s"alpha must be a numeric literal, got $other")
        }
        SeededEwma(es(0), alpha, intLit(es(2), "seedPeriods"))
      }),
    ("deflate_len", info("deflate_len",
      "deflate_len(text) - zlib-deflated byte length (compression-ratio quality signal numerator)"),
      (es: Seq[Expression]) => DeflateLenExpr(es(0))),
    ("window_hashes", info("window_hashes",
      "window_hashes(text, w) - rolling polynomial hash of every w-token window"),
      (es: Seq[Expression]) => WindowHashesExpr(es(0), intLit(es(1), "w"))),
    ("simhash_bucket_pairs", info("simhash_bucket_pairs",
      "simhash_bucket_pairs(ids, ck, width, maxHamming) - verified (a,b,hamming) pairs " +
        "of one pigeonhole bucket's (doc_id, simhash) list; first-agreeing-chunk dedup"),
      (es: Seq[Expression]) => SimhashBucketPairsExpr(es(0), es(1),
        intLit(es(2), "width"), intLit(es(3), "maxHamming"))))

  /** Register everything on a live session (idempotent). */
  def registerAll(spark: SparkSession): Unit =
    functions.foreach { case (name, inf, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), inf, builder)
    }
}
