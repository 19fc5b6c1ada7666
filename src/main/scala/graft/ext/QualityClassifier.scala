package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trained quality classifier — the model-based tier above
  * [[TextAnalysis.qualityFeatures]]'s heuristic score (the
  * fasttext-classifier role in CCNet/LLaMA-style pipelines: fit a
  * cheap linear model on labeled/weakly-labeled docs, score the whole
  * corpus, gate or resample on the probability).
  *
  * Logistic regression over the per-row quality features via Spark ML
  * (same precedent as the KMeans/PCA embedding ops). Scale shape:
  * each L-BFGS iteration is ONE mergeable treeAggregate pass over the
  * corpus — gradients partial-combine map-side, the corpus never
  * shuffles, and only the (n_features+1)-long coefficient vector ever
  * sits on the driver. Scoring is a per-row dot product, zero
  * shuffles. Feature standardization is handled inside ML's LR
  * (standardization=true default), so raw feature scales don't skew
  * the conditioning.
  *
  * Rows-only vs an oracle (L-BFGS isn't ANSI SQL, and gradient-sum
  * float order varies with partitioning); QualityClassifierSpec
  * asserts separation on a constructed corpus and sane probabilities.
  */
object QualityClassifier {

  /** Fit on `labelExpr` (boolean weak label, e.g. lang = 'en') and
    * score every doc: (doc_id, label, prob, pred). `prob` is rounded
    * to 4 dp — well above float-order drift, enough for gating.
    */
  def trainScore(docs: DataFrame, labelExpr: Column,
                 maxIter: Int = 25, regParam: Double = 0.01): DataFrame = {
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
    val feats = TextAnalysis.qualityFeatures(docs)
      .select(col("doc_id"), labelExpr.cast("double").as("label"),
        array_to_vector(array(
          col("n_tokens").cast("double"), col("avg_token_len"),
          col("stopword_ratio"), col("punct_ratio"),
          col("quality_score"))).as("features"))
    val model = new LogisticRegression()
      .setMaxIter(maxIter).setRegParam(regParam)
      .fit(feats)
    model.transform(feats)
      .select(col("doc_id"), col("label").cast("long").as("label"),
        round(element_at(vector_to_array(col("probability")), 2), 4).as("prob"),
        col("prediction").cast("long").as("pred"))
  }

  /** FIXED-WEIGHT scoring (X229) — the engine-portable oracle twin of
    * the classifier family (the X153/X163 move): [[trainScore]]'s
    * L-BFGS fit is rows-only forever (gradient-sum float order varies
    * with partitioning and isn't ANSI SQL), but the part a PRODUCTION
    * gate actually runs per row — features → w·x + b → sigmoid →
    * threshold — is plain arithmetic over the already-oracle-green
    * quality features (q_text_quality). Scoring with a pinned weight
    * vector (the deploy-time shape: fit offline once, ship the
    * coefficients, score 100 TB statelessly) recomposes term-by-term
    * in DuckDB: same feature values, same multiply-add order (the
    * explicit chain below), same exp/division, 6-dp rounded both
    * sides. This pins the entire scoring arithmetic cross-engine,
    * leaving only the optimizer itself unverified by oracle.
    *
    * Per-row projection, zero shuffles, codegen'd built-ins only.
    */
  def scoreFixed(docs: DataFrame,
                 weights: Seq[Double] = Seq(0.002, -0.5, 6.0, -6.0, 3.0),
                 bias: Double = 0.0, threshold: Double = 0.5): DataFrame = {
    require(weights.length == 5, s"5 feature weights expected, got ${weights.length}")
    val feats = TextAnalysis.qualityFeatures(docs)
    // explicit left-to-right multiply-add chain — the order the oracle
    // replays; a `sum(array)` would leave the order to the engine
    val z = weights.zip(Seq(
      col("n_tokens").cast("double"), col("avg_token_len"),
      col("stopword_ratio"), col("punct_ratio"), col("quality_score")))
      .foldLeft(lit(bias)) { case (acc, (w, f)) => acc + lit(w) * f }
    val prob = lit(1.0) / (lit(1.0) + exp(-z))
    // threshold in z-space (logit): z is an EXACT multiply-add chain,
    // so the gate decision never rides a last-ULP exp difference —
    // only the reported probability does, behind the 6-dp round
    val zCut = math.log(threshold / (1.0 - threshold))
    feats.select(col("doc_id"),
      round(prob, 6).as("prob"),
      (z >= lit(zCut)).as("pred"))
  }
}
