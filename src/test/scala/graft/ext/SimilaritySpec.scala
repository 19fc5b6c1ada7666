package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("dot / l2norm / cosine basics") {
    val df = Seq((1L, Seq(3.0f, 4.0f), Seq(4.0f, 3.0f))).toDF("id", "a", "b")
    val r = df.select(
      Similarity.dot($"a", $"b"), Similarity.l2norm($"a"), Similarity.cosine($"a", $"a")).head()
    assert(r.getDouble(0) === 24.0)
    assert(r.getDouble(1) === 5.0)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-12)
  }

  test("bruteForceTopK: exact ranks, k rows per query, self-consistent ordering") {
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val out = Similarity.bruteForceTopK(
      e.filter($"vec_id" < 3), e.filter($"vec_id" >= 3), k = 5).collect()
    assert(out.length === 15)
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq === (1L to 5L))
      // sims are non-increasing with rank
      assert(sorted.map(_.getDouble(3)).sliding(2).forall(p => p(0) >= p(1)))
    }
  }

  test("lshTopK: reasonable recall vs brute force on random vectors, exact sims") {
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = e.filter($"vec_id" < 10)
    val c = e.filter($"vec_id" >= 10)
    val exact = Similarity.bruteForceTopK(q, c, 10).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = Similarity.lshTopK(q, c, 10).collect()
    val approxSet = approx.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact & approxSet).size.toDouble / exact.size
    assert(recall >= 0.3, s"recall $recall too low even for isotropic random vectors")
    // every returned sim must equal the exact cosine (rerank is exact)
    val exactSims = Similarity.bruteForceTopK(q, c, Int.MaxValue).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    approx.foreach(r => assert(r.getDouble(3) === exactSims((r.getLong(0), r.getLong(2)))))
  }

  test("ivfTopK: reasonable recall vs brute force, exact sims for returned pairs") {
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = e.filter(col("vec_id") < 5)
    val c = e.filter(col("vec_id") >= 5)
    val exact = Similarity.bruteForceTopK(q, c, 10).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = Similarity.ivfTopK(q, c, 10, nlist = 8, nprobe = 4).collect()
    val approxPairs = approx.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact & approxPairs).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF recall too low: $recall")
    // sims are exact for whatever pairs IVF returns
    val bySim = Similarity.bruteForceTopK(q, c, c.count().toInt).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    approx.foreach(r => assert(math.abs(r.getDouble(3) - bySim((r.getLong(0), r.getLong(2)))) < 1e-12))
  }

  test("embeddingNearDups: symmetric-free (a<b) and threshold-respecting") {
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val out = Similarity.embeddingNearDups(e, 0.4).collect()
    out.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.4)
    }
  }
}
