package graft.tools

import graft.Tables
import graft.ext.{Contamination, CorpusPipeline, Dedup, Pii, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-by-stage attribution of the corpus-prep pipeline — ad-hoc
  * profiling main, not part of the driver contract.
  */
object ProfPrep {
  def noop(df: DataFrame): Unit = df.write.mode("overwrite").format("noop").save()
  def time(label: String)(f: => Unit): Unit = {
    System.gc()
    val t0 = System.nanoTime()
    f
    println(f"[prep] $label%-44s ${(System.nanoTime() - t0) / 1e9}%.2f s")
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    spark.range(1000).selectExpr("sum(id)").collect()

    val docs = Tables.documents(spark, dir)
    val bench = docs.orderBy(col("doc_id")).limit(20)
    val cfg = CorpusPipeline.Config()

    // warm-up full pipeline once (codegen/JIT)
    time("full pipeline (cold)") { noop(CorpusPipeline.prepare(docs, bench, cfg)) }
    time("full pipeline (warm)") { noop(CorpusPipeline.prepare(docs, bench, cfg)) }

    // stages — stage 1-2 IS the pipeline's own hygieneGate (extracted
    // precisely so this profile can't drift from the real gates)
    val normBench = bench.withColumn("text", TextAnalysis.normalizeText(col("text")))
    var benchShingles: java.util.HashSet[String] = null
    time("stage 3a bench shingle set collect") {
      benchShingles = Contamination.benchShingleSet(normBench, cfg.decontamNgram)
    }
    var corpus: DataFrame = null
    time("stage 1-3 gates+decontam+split+tokens + ckpt") {
      corpus = TextAnalysis.splitAssign(
          CorpusPipeline.hygieneGate(docs, cfg).select("doc_id", "text", "quality_score"))
        .filter(!graft.functions.native.sharesShingle(
          col("text"), cfg.decontamNgram, benchShingles))
        .withColumn("n_tokens", TextAnalysis.tokenCount(col("text")).cast("long"))
        .localCheckpoint(true)
    }
    var thin: DataFrame = null
    time("stage 4-5 pair build + thin anti-join + ckpt") {
      val pairs = Dedup.ngramJaccardPairs(corpus, cfg.dedupNgram, cfg.dedupJaccard)
      val losers = pairs.select(col("b").as("doc_id")).localCheckpoint(true)
      thin = corpus.select("doc_id", "quality_score", "split", "n_tokens")
        .join(broadcast(losers), Seq("doc_id"), "left_anti")
        .localCheckpoint(true)
    }
    time("stage 6 pack + text rejoin (noop)") {
      val packed = graft.ops.TotalOrder.packSequencesPerGroup(thin, "split",
        Seq(md5(col("doc_id").cast("string")), col("doc_id")), "n_tokens", cfg.packTokens)
      noop(packed.join(corpus.select("doc_id", "text"), Seq("doc_id"))
        .select("doc_id", "text", "quality_score", "split", "pack_id"))
    }
    spark.stop()
  }
}
