package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class ContaminationSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  // a benchmark question and a corpus where doc 10 quotes it verbatim
  private val bench = docs(
    (100L, "what is the capital of france answer paris of course"))
  private val corpus = docs(
    (10L, "trivia dump: what is the capital of france answer paris obviously"),
    (11L, "completely unrelated text about spark shuffles and partitions here"),
    (12L, "france paris capital the is what")) // same words, different order — no shared 5-gram

  test("flag finds verbatim overlap and nothing else") {
    val flagged = Contamination.flag(corpus, bench, n = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(flagged.keySet === Set(10L))
    // shared distinct 5-grams of "what is the capital of france answer paris":
    // 8-token overlap run → 4 shared 5-grams
    assert(flagged(10L) === 4L)
  }

  test("minShared raises the bar") {
    assert(Contamination.flag(corpus, bench, n = 5, minShared = 5).count() === 0L)
  }

  test("clean drops exactly the flagged docs") {
    val kept = Contamination.clean(corpus, bench, n = 5)
      .select(col("doc_id")).as[Long].collect().sorted
    assert(kept.toSeq === Seq(11L, 12L))
  }
}
