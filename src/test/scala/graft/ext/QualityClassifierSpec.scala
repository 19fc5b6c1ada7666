package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  // separable corpus: prose docs are stopword-dense with plausible
  // token lengths; junk docs are repeated consonant runs
  private val prose = (1L to 30L).map { i =>
    (i, "the quick analysis of the data shows that it is a very good " +
      s"result for the model and the pipeline run number $i of this set", 1)
  }
  private val junk = (31L to 60L).map { i =>
    (i, s"zzzzzzzz qqqqqqqq xxxxxxxxxx kkkkkkkkkkk wwwwwwwww $i", 0)
  }
  private val docs = (prose ++ junk).map { case (id, t, y) => (id, t, y) }
    .toDF("doc_id", "text", "y")

  test("trainScore separates an obviously separable corpus") {
    val out = QualityClassifier.trainScore(docs, col("y") === 1)
    val rows = out.collect()
    assert(rows.length === 60)
    val acc = rows.count(r => r.getAs[Long]("pred") == r.getAs[Long]("label")) / 60.0
    assert(acc >= 0.95, s"accuracy $acc")
    // probabilities are calibrated to the right side for every doc
    val avgProse = rows.filter(_.getAs[Long]("label") == 1L).map(_.getAs[Double]("prob")).sum / 30
    val avgJunk = rows.filter(_.getAs[Long]("label") == 0L).map(_.getAs[Double]("prob")).sum / 30
    assert(avgProse > 0.8 && avgJunk < 0.2, s"prose $avgProse junk $avgJunk")
    rows.foreach(r => assert(r.getAs[Double]("prob") >= 0.0 && r.getAs[Double]("prob") <= 1.0))
  }

  test("scoreFixed: hand-replayed z chain, z-space gate, monotone in stopword mass (X229)") {
    // one doc with hand-computable features: 4 tokens, no punctuation
    val one = Seq((1L, "the cat sat down")).toDF("doc_id", "text")
    val r = QualityClassifier.scoreFixed(one,
      weights = Seq(0.1, 0.0, 0.0, 0.0, 0.0), bias = -0.2).head()
    // z = -0.2 + 0.1*4 = 0.2; prob = 1/(1+e^-0.2)
    val z = -0.2 + 0.1 * 4
    assert(math.abs(r.getAs[Double]("prob") - 1.0 / (1.0 + math.exp(-z))) < 1e-6)
    assert(r.getAs[Boolean]("pred"), "z=0.2 > 0 gates true at threshold 0.5")
    // gate decision moves with the threshold via the logit, not exp
    val strict = QualityClassifier.scoreFixed(one,
      weights = Seq(0.1, 0.0, 0.0, 0.0, 0.0), bias = -0.2, threshold = 0.6).head()
    assert(!strict.getAs[Boolean]("pred"), "logit(0.6) ~ 0.405 > z")
    // default weights: the separable corpus scores prose above junk
    val scored = QualityClassifier.scoreFixed(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("prob")).toMap
    val avgProse = (1L to 30L).map(scored).sum / 30
    val avgJunk = (31L to 60L).map(scored).sum / 30
    assert(avgProse > avgJunk,
      s"fixed weights must still order prose ($avgProse) above junk ($avgJunk)")
  }
}
