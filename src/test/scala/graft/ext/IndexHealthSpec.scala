package graft.ext

import graft.SparkSpec
import graft.store.Warehouse
import org.apache.spark.sql.functions._

/** r16 bucket-index health advice — the load-bearing claims:
  * (1) a BALANCED, well-clustered index does not trip (probe fraction
  *     and hot share both small);
  * (2) a layout-decayed index (one file spanning every bucket — the
  *     un-compacted streaming-append end state) trips the
  *     probe-fraction signal;
  * (3) a df-skewed index (one token's postings dominating) trips the
  *     HOT-BUCKET signal even when the probe fraction stays low;
  * (4) the decision reads ZERO data bytes (poison every file first);
  * (5) below the byte floor the advice abstains.
  */
class IndexHealthSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_$tag").toString + "/t"

  private def withParts[T](n: Int)(f: => T): T = {
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try { spark.conf.set("spark.sql.shuffle.partitions", n.toString); f }
    finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }

  test("balanced text index: no advice; poisoned files: decision still answers (zero data I/O)") {
    val root = freshRoot("ih_bal")
    val docs = (1 to 400).map(i => (i.toLong, s"tok$i other$i third$i")).toDF("doc_id", "text")
    withParts(32)(TextIndex.buildTextIndex(docs, root, bucketCount = 64))
    val a = TextIndex.textIndexAdvice(spark, root, minBytes = 1)
    assert(!a.rebuildAdvised, a.toString)
    assert(a.probeFraction.exists(_ < 0.25), a.toString)
    assert(a.hotBucketShare.exists(_ < 0.25), a.toString)
    assert(a.files > 4, s"need several files for the claim to bite: $a")
    // zero data I/O: corrupt every data file, the decision is unchanged
    Warehouse.readSnapshot(spark, root).inputFiles.foreach { f =>
      val o = new java.io.FileOutputStream(new java.io.File(new java.net.URI(f)))
      o.write("not parquet".getBytes); o.close()
    }
    assert(TextIndex.textIndexAdvice(spark, root, minBytes = 1) === a)
  }

  test("one-file layout trips the probe-fraction signal; byte floor abstains") {
    val root = freshRoot("ih_wide")
    val docs = (1 to 400).map(i => (i.toLong, s"tok$i other$i third$i")).toDF("doc_id", "text")
    withParts(1)(TextIndex.buildTextIndex(docs, root, bucketCount = 64))
    val a = TextIndex.textIndexAdvice(spark, root, minBytes = 1)
    assert(a.rebuildAdvised, a.toString)
    assert(a.probeFraction.exists(_ > 0.9),
      s"one file spanning every bucket means every probe opens ~all bytes: $a")
    // the abstention floor: same index, advisory floor above its size
    val small = TextIndex.textIndexAdvice(spark, root, minBytes = 1L << 40)
    assert(!small.rebuildAdvised && small.probeFraction.isEmpty,
      s"below the floor the advice must abstain, not guess: $small")
    assert(small.reason.contains("not enough signal"), small.reason)
  }

  test("df-skewed postings trip the HOT-BUCKET signal at a low probe fraction") {
    val root = freshRoot("ih_hot")
    // every doc carries the dominating token: its posting list is half
    // the index, all in one bucket; the other half spreads over 64
    val docs = (1 to 2000).map(i => (i.toLong, s"common uniq$i")).toDF("doc_id", "text")
    withParts(32)(TextIndex.buildTextIndex(docs, root, bucketCount = 64))
    val a = TextIndex.textIndexAdvice(spark, root, minBytes = 1, hotShareBound = 0.25)
    assert(a.hotBucketShare.exists(_ >= 0.25),
      s"the dominating token's bucket must surface: $a")
    assert(a.rebuildAdvised, a.toString)
    assert(a.reason.contains("skew") || a.reason.contains("hottest"), a.reason)
  }

  test("shingle + posting wrappers: balanced sf0.001 builds stay quiet") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val sroot = freshRoot("ih_sh")
    withParts(32)(ShingleIndex.buildShingleIndex(docs, sroot, n = 3))
    val sa = ShingleIndex.shingleIndexAdvice(spark, sroot, minBytes = 1)
    assert(!sa.rebuildAdvised, sa.toString)
    val proot = freshRoot("ih_pi")
    withParts(32)(PostingIndex.buildPostingIndex(docs, proot, n = 3))
    val pa = PostingIndex.postingIndexAdvice(spark, proot, minBytes = 1)
    assert(!pa.rebuildAdvised, pa.toString)
  }

  test("coverage audit (r16): clean round-trip, planted gap routes to refresh, planted orphan routes to rebuild") {
    val root = freshRoot("ih_cov")
    val docs = (1 to 60).map(i =>
      (i.toLong, if (i == 7) null.asInstanceOf[String] else s"alpha$i beta$i gamma$i"))
      .toDF("doc_id", "text")
    TextIndex.buildTextIndex(docs, root)
    // clean: sentinels make the NULL-text doc visible, audit is green
    val clean = IndexHealth.auditIndexCoverage(docs.select("doc_id"), root, "doc_id")
    assert(clean.consistent && clean.corpusIds === 60L && clean.indexIds === 60L,
      clean.toString)
    // corpus grew without a refresh -> MISSING, with the gap ids named
    val grown = docs.unionByName(Seq((61L, "delta x"), (62L, "delta y"))
      .toDF("doc_id", "text"))
    val gap = IndexHealth.auditIndexCoverage(grown.select("doc_id"), root, "doc_id")
    assert(!gap.consistent && gap.missing === 2L && gap.orphaned === 0L)
    assert(gap.missingSample.toSet === Set(61L, 62L))
    // the named repair IS the refresh: after it, the audit is green
    TextIndex.refreshTextIndex(grown, root)
    assert(IndexHealth.auditIndexCoverage(grown.select("doc_id"), root, "doc_id")
      .consistent)
    // corpus shrank (a delete that bypassed the index) -> ORPHANED
    val shrunk = grown.filter($"doc_id" =!= 30L)
    val orphan = IndexHealth.auditIndexCoverage(shrunk.select("doc_id"), root, "doc_id")
    assert(!orphan.consistent && orphan.orphaned === 1L && orphan.missing === 0L)
    assert(orphan.orphanedSample === Seq(30L))
    // one id column enforced
    val e = intercept[IllegalArgumentException] {
      IndexHealth.auditIndexCoverage(grown, root, "doc_id")
    }
    assert(e.getMessage.contains("ONE id column"))
    // dirty ids — the audit's own use case (r16 review): a NULL id
    // surfaces as its own finding instead of NPE-ing the sample
    // collect or inflating `missing`
    val dirty = grown.select("doc_id")
      .unionByName(Seq(Tuple1(null.asInstanceOf[java.lang.Long]))
        .toDF("doc_id"))
    val d = IndexHealth.auditIndexCoverage(dirty, root, "doc_id")
    assert(!d.consistent && d.nullCorpusIds === 1L && d.missing === 0L &&
      d.orphaned === 0L, d.toString)
  }
}
