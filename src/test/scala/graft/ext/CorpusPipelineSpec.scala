package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusPipelineSpec extends SparkSpec {
  import spark.implicits._

  // a corpus exercising every gate:
  //  1: good doc (survives everything)
  //  2: near-dup of 1 with higher id (dropped by keep-first dedup)
  //  3: degenerate repetition (dropped by dup_token_frac gate)
  //  4: PII (dropped by email gate)
  //  5: contaminated (quotes the benchmark 5-gram run)
  //  6: good doc, distinct content (survives)
  private val goodText =
    "the analysis of shuffle behavior in distributed engines rewards " +
    "careful attention to partitioning and to the costs of wide dependencies"
  private val corpus = Seq(
    (1L, goodText),
    (2L, goodText + " appendix"),
    (3L, Seq.fill(40)("spam").mkString(" ")),
    (4L, "contact me at alice@example.com for the dataset and the paper draft " +
      "with all of the other materials we discussed in the longer meeting"),
    (5L, "prelude text then what is the capital of france answer paris " +
      "plus more than enough filler to pass the quality gates easily here"),
    (6L, "a completely different and reasonably long document about the " +
      "evaluation of retrieval systems under domain shift and noisy labels")
  ).toDF("doc_id", "text")
  private val bench = Seq(
    (100L, "what is the capital of france answer paris of course")
  ).toDF("doc_id", "text")

  test("every gate fires on its designated doc; survivors carry split + pack") {
    val out = CorpusPipeline.prepare(corpus, bench,
      CorpusPipeline.Config(minQuality = 0.2, maxDupTokenFrac = 0.5))
    val rows = out.collect()
    val ids = rows.map(_.getAs[Long]("doc_id")).sorted
    assert(ids.toSeq === Seq(1L, 6L), s"survivors: ${ids.mkString(",")}")
    // schema contract
    assert(out.columns.toSeq === Seq("doc_id", "text", "quality_score", "split", "pack_id"))
    rows.foreach { r =>
      assert(Set("train", "val", "test").contains(r.getAs[String]("split")))
      assert(r.getAs[Long]("pack_id") >= 0L)
    }
  }

  test("minhash pair-source switch: same survivors as the exact form on clear dups") {
    // exact clones have jaccard 1.0 — banding recall is 1 for them, and
    // candidates are exact-verified, so the scale form must agree here
    val exact = CorpusPipeline.prepare(corpus, bench,
      CorpusPipeline.Config(minQuality = 0.2, maxDupTokenFrac = 0.5))
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val mh = CorpusPipeline.prepare(corpus, bench,
      CorpusPipeline.Config(minQuality = 0.2, maxDupTokenFrac = 0.5, dedupMinhash = true))
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(mh.toSeq === exact.toSeq)
  }

  test("deterministic across partitionings and reruns") {
    def run(np: Int) = CorpusPipeline.prepare(corpus.repartition(np), bench)
      .collect().map(r => (r.getLong(0), r.getString(3), r.getLong(4))).sortBy(_._1).toSeq
    assert(run(1) === run(7))
    assert(run(7) === run(7))
  }

  test("empty benchmark: decontamination is a no-op, the contaminated doc survives") {
    // guards the r8 per-row probe's empty-set short-circuit (the Bloom
    // NPE family of bugs — see EmptyInputSpec — but for the HashSet form)
    val out = CorpusPipeline.prepare(corpus, bench.limit(0),
      CorpusPipeline.Config(minQuality = 0.2, maxDupTokenFrac = 0.5))
    assert(out.collect().map(_.getAs[Long]("doc_id")).sorted.toSeq === Seq(1L, 5L, 6L))
  }

  test("hygiene + decontam + split + tokens front is ONE zero-shuffle projection") {
    // the r8 shape: with decontamination folded into a scan-local
    // predicate, everything upstream of the pipeline's checkpoint is a
    // single Catalyst-collapsed projection+filter — no Exchange, no
    // join, no aggregate may appear (they would mean the probe regressed
    // to the explode→join→agg subplan this shape deleted)
    val normBench = bench.withColumn("text", TextAnalysis.normalizeText(col("text")))
    val benchSet = Contamination.benchShingleSet(normBench, 5)
    val front = TextAnalysis.splitAssign(
        CorpusPipeline.hygieneGate(corpus).select("doc_id", "text", "quality_score"))
      .filter(!graft.functions.native.sharesShingle(col("text"), 5, benchSet))
      .withColumn("n_tokens", TextAnalysis.tokenCount(col("text")).cast("long"))
    val p = front.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"front shuffles:\n${p.take(1500)}")
    assert(!p.contains("Join"), s"front joins:\n${p.take(1500)}")
    assert(!p.toLowerCase.contains("aggregate"), s"front aggregates:\n${p.take(1500)}")
  }

  test("prepared corpus round-trips the warehouse split-partitioned with pruned reads") {
    val dir = java.nio.file.Files.createTempDirectory("corpus_wh").toString
    val prepared = CorpusPipeline.prepare(corpus, bench)
    graft.store.Warehouse.writePartitioned(prepared, dir, Seq("split"))
    // pruned read: only the train partition's directories are scanned
    val train = graft.store.Warehouse.readPartitions(spark, dir, "split", Seq("train"))
    val scan = train.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("split"), scan.take(1500))
    val expected = prepared.filter($"split" === "train").select("doc_id")
      .as[Long].collect().sorted
    assert(train.select("doc_id").as[Long].collect().sorted.toSeq === expected.toSeq)
    // full read returns every surviving doc
    assert(spark.read.parquet(dir).count() === prepared.count())
  }

  test("packing respects the token budget over the deterministic order") {
    // many tiny docs, no gates firing: pack boundaries are exact
    val many = (10L until 60L)
      .map(i => (i, s"document number $i with exactly eight whitespace tokens"))
      .toDF("doc_id", "text")
    val noBench = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val out = CorpusPipeline.prepare(many, noBench,
      CorpusPipeline.Config(minQuality = 0.0, packTokens = 24L))
    // 8 tokens per doc, budget 24 → exactly 3 docs per pack; pack_id
    // is scoped per split (packs never straddle train/val/test)
    val sizes = out.groupBy("split", "pack_id").count().collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out.count() === 50L)
    assert(sizes.values.forall(_ <= 3L))
    // within each split only the tail pack may be short
    sizes.keys.map(_._1).toSet.foreach { sp: String =>
      val perSplit = sizes.filter(_._1._1 == sp).values.toSeq
      assert(perSplit.count(_ < 3L) <= 1, s"split $sp packs: $perSplit")
    }
  }
}
