package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("registerAll exposes the native functions to spark.sql") {
    Registry.registerAll(spark)
    Seq((1L, "the quick brown fox jumps")).toDF("id", "text").createOrReplaceTempView("ext_docs")
    val sh = spark.sql("SELECT word_shingles(text, 3) AS sh FROM ext_docs").head().getSeq[String](0)
    assert(sh === Seq("the quick brown", "quick brown fox", "brown fox jumps"))

    Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b").createOrReplaceTempView("ext_vecs")
    assert(spark.sql("SELECT dot_f(a, b) AS d FROM ext_vecs").head().getDouble(0) === 11.0)

    // SQL minhash_sig(seed default 42) == Column-API signatures
    val sqlSig = spark.sql("SELECT minhash_sig(word_shingles(text, 3), 16) AS sig FROM ext_docs")
      .head().getSeq[Long](0)
    val colSig = graft.ext.Dedup.minhashSignatures(
      Seq((1L, "the quick brown fox jumps")).toDF("doc_id", "text"), n = 3, numHashes = 16)
      .head().getSeq[Long](1)
    assert(sqlSig === colSig)

    val fp = spark.sql("SELECT simhash64(word_shingles(text, 3)) AS fp FROM ext_docs").head().getLong(0)
    val fpCol = graft.ext.Dedup.simhash(Seq((1L, "the quick brown fox jumps")).toDF("doc_id", "text"))
      .head().getLong(1)
    assert(fp === fpCol)

    // r7 additions: deflate_len and window_hashes agree with the Column API
    val dl = spark.sql("SELECT deflate_len(text) AS dl FROM ext_docs").head().getLong(0)
    assert(dl > 0L)
    assert(dl === Seq((1L, "the quick brown fox jumps")).toDF("doc_id", "text")
      .select(graft.functions.native.deflateLen($"text")).head().getLong(0))
    val wh = spark.sql("SELECT window_hashes(text, 2) AS wh FROM ext_docs").head().getSeq[Long](0)
    assert(wh.length === 4) // 5 tokens, w=2 → 4 windows
  }

  test("non-literal parameter is rejected with a clear error") {
    Registry.registerAll(spark)
    Seq((3, "a b c d")).toDF("n", "text").createOrReplaceTempView("ext_bad")
    val e = intercept[Exception] {
      spark.sql("SELECT word_shingles(text, n) FROM ext_bad").collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }

  test("seeded_ewma works from SQL with an OVER clause") {
    Registry.registerAll(spark)
    Seq((1, 10.0), (2, 20.0), (3, 30.0)).toDF("i", "x").createOrReplaceTempView("ewma_t")
    val out = spark.sql(
      """SELECT i, seeded_ewma(x, 0.5, 1) OVER
        |  (ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS e
        |FROM ewma_t ORDER BY i""".stripMargin).collect().map(_.getDouble(1))
    // 10; 0.5*20+0.5*10=15; 0.5*30+0.5*15=22.5
    assert(out.toSeq === Seq(10.0, 15.0, 22.5))
  }
}
