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
}
