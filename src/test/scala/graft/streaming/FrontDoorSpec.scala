package graft.streaming

import graft.SparkSpec
import graft.ext.{CorpusPipeline, ShingleIndex, VectorIndex}
import graft.store.Warehouse
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** r16 crawl front door (the r15 verdict #6) — the full ingest loop as
  * one call / one sink. Claims:
  * (1) the batch cycle gates, screens against BOTH persisted indexes,
  *     admits survivors and refreshes BOTH indexes with them;
  * (2) replay idempotence across BOTH indexes AND the corpus table:
  *     re-running a fully-processed batch changes nothing anywhere
  *     (the id gate short-circuits; epoch gate dedups the corpus);
  * (3) batch ≡ stream: the sink's per-micro-batch admissions equal
  *     the batch cycle's over the same frames;
  * (4) the sink's write ORDER survives a crash between the corpus
  *     append and the index refreshes — replaying the same epoch
  *     re-admits the same survivors, skips the corpus append, and the
  *     refreshes land (the loss window the ordering argument closes).
  */
class FrontDoorSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_$tag").toString + "/t"

  // distinct vocabularies per doc: the text screen works on 3-shingle
  // jaccard, so test docs must not share sentence stock unless the
  // test WANTS them flagged
  private val cat100Text =
    "the quick brown fox jumps over a lazy dog and it runs to the river " +
      "where the water is cold and the light of morning falls in long lines"
  private val cat101Text =
    "a gentle rain settles on the harbor while boats rock slowly and the " +
      "old sailor watches the grey clouds drift across the evening sky"
  private def fillerText(i: Int) =
    s"the tall green tree number word$i stands by the old stone wall and " +
      "the wide field waits under a pale sky while birds sing in the hedges"

  private val dim = 8
  private def vec(seed: Int): Array[Float] = {
    val r = new scala.util.Random(seed)
    Array.fill(dim)(r.nextFloat() + 0.1f)
  }

  private def builtIndexes(): (String, String) = {
    val sroot = freshRoot("fd_sh")
    val vroot = freshRoot("fd_vec")
    val catalog = ((100L, cat100Text, vec(100)) +:
      (101L, cat101Text, vec(101)) +:
      (102 to 109).map(i => (i.toLong, fillerText(i), vec(i))))
      .toDF("doc_id", "text", "embedding")
    ShingleIndex.buildShingleIndex(catalog.select("doc_id", "text"), sroot, n = 3)
    VectorIndex.buildIvfIndex(
      catalog.select(col("doc_id").as("vec_id"), col("embedding")), vroot,
      nlist = 4, fitSample = 10)
    (sroot, vroot)
  }

  private def batchDf = Seq(
    // exact text clone of catalog 100 → every band agrees, the text
    // screen drops it deterministically
    (1L, cat100Text, vec(1)),
    // exact-embedding clone of catalog 101 → embedding screen drops
    (2L, "snow gathers on the high passes as the wind carves long drifts " +
      "and the climbers wait in the small hut for the storm to end", vec(101)),
    // novel on both sides → admitted
    (3L, "deep beneath the valley floor the miners follow a seam of silver " +
      "and their lamps throw amber circles on the wet rock walls", vec(3)),
    // hygiene reject (repetition) → gate drops
    (4L, Seq.fill(40)("spam").mkString(" "), vec(4)),
    // NULL embedding, novel text → admitted, shingle-side only
    (5L, "in the quiet library a scholar turns brittle pages and notes " +
      "each date in a narrow ledger while dust drifts in the window light",
      null.asInstanceOf[Array[Float]]))
    .toDF("doc_id", "text", "embedding")

  test("batch cycle: gate + both screens + both refreshes; replay changes nothing") {
    val (sroot, vroot) = builtIndexes()
    val admitted = CorpusPipeline.ingestFrontDoor(batchDf, sroot, vroot,
      jaccard = 0.5, cosine = 0.99)
    val ids = admitted.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids === Set(3L, 5L), s"text dup, embed dup and spam must drop: $ids")
    val shingleIds = Warehouse.readSnapshot(spark, sroot)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(shingleIds === (102L to 109L).toSet ++ Set(100L, 101L, 3L, 5L),
      s"survivors index: $shingleIds")
    val vecIds = Warehouse.readSnapshot(spark, vroot)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(vecIds === (102L to 109L).toSet ++ Set(100L, 101L, 3L),
      s"NULL-embedding survivors stay shingle-only: $vecIds")
    // REPLAY the whole batch: id gate short-circuits; nothing changes
    val vS = Warehouse.currentSnapshot(spark, sroot)
    val vV = Warehouse.currentSnapshot(spark, vroot)
    val replay = CorpusPipeline.ingestFrontDoor(batchDf, sroot, vroot,
      jaccard = 0.5, cosine = 0.99)
    assert(replay.isEmpty, "a fully-processed batch must re-admit nothing")
    assert(Warehouse.currentSnapshot(spark, sroot) === vS)
    assert(Warehouse.currentSnapshot(spark, vroot) === vV)
  }

  test("crash window between corpus append and refreshes: replay re-admits the same survivors and completes") {
    val (sroot, vroot) = builtIndexes()
    val corpus = freshRoot("fd_corpus")
    // simulate the sink's crash window: screens ran, corpus append
    // landed (epoch-gated), the process died before either refresh
    val admitted = CorpusPipeline.screenFrontDoor(batchDf, sroot, vroot,
      jaccard = 0.5, cosine = 0.99)
    Warehouse.commitStreamBatch(admitted, corpus, "app-fd-test", epoch = 7L)
    val corpusCount = Warehouse.readSnapshot(spark, corpus).count()
    assert(corpusCount === 2)
    // REPLAY of the same epoch, now through the full body: the screens
    // recompute the SAME survivors (no index write landed), the epoch
    // gate skips the corpus append, the refreshes land
    val replayAdmitted = CorpusPipeline.screenFrontDoor(batchDf, sroot, vroot,
      jaccard = 0.5, cosine = 0.99)
    assert(replayAdmitted.select("doc_id").collect().map(_.getLong(0)).toSet
      === Set(3L, 5L), "replay must re-derive the same survivor set")
    Warehouse.commitStreamBatch(replayAdmitted, corpus, "app-fd-test", epoch = 7L)
    assert(Warehouse.readSnapshot(spark, corpus).count() === corpusCount,
      "the epoch gate must dedup the corpus append")
    CorpusPipeline.ingestFrontDoor(batchDf, sroot, vroot,
      jaccard = 0.5, cosine = 0.99)
    assert(Warehouse.readSnapshot(spark, sroot)
      .select("doc_id").distinct().count() === 12)
    assert(Warehouse.readSnapshot(spark, vroot).count() === 11)
  }

  test("streaming sink == batch cycle: same admissions, replayed micro-batch is a full no-op") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val (sroot, vroot) = builtIndexes()
    val (srootB, vrootB) = builtIndexes()
    val corpus = freshRoot("fd_sink_corpus")
    val input = MemoryStream[(Long, String, Array[Float])]
    val rows = batchDf.collect().map(r => (r.getLong(0), r.getString(1),
      if (r.isNullAt(2)) null else r.getSeq[Float](2).toArray))
    def drain(ck: String): Unit = {
      val q = CorpusPipeline.frontDoorSink(
        input.toDF().toDF("doc_id", "text", "embedding"), sroot, vroot, corpus,
        s"${System.getProperty("java.io.tmpdir")}/graft_fd_ck_$ck" +
          s"_${ProcessHandle.current().pid()}_${System.nanoTime()}",
        jaccard = 0.5, cosine = 0.99).start()
      try q.processAllAvailable() finally q.stop()
    }
    input.addData(rows.toIndexedSeq: _*)
    drain("a")
    // batch twin over the same frames
    val batchAdmitted = CorpusPipeline.ingestFrontDoor(batchDf, srootB, vrootB,
      jaccard = 0.5, cosine = 0.99)
    val sinkCorpus = Warehouse.readSnapshot(spark, corpus)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(sinkCorpus === batchAdmitted.select("doc_id")
      .collect().map(_.getLong(0)).toSet, "stream and batch must admit identically")
    def state() = (
      Warehouse.currentSnapshot(spark, sroot),
      Warehouse.currentSnapshot(spark, vroot),
      Warehouse.readSnapshot(spark, corpus).count())
    val before = state()
    // a FRESH checkpoint replays the same data: everything no-ops
    // (id gate + anti-joins; corpus epoch restarts at 0 under the new
    // checkpoint but the admitted set is empty, so nothing commits)
    drain("b")
    assert(state() === before, "a replayed stream must change nothing anywhere")
  }
}
