package graft.ext

import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("shingles: distinct word 3-grams, 1-based-window semantics") {
    val out = docs((1L, "a b c d c d")) // windows: "a b c","b c d","c d c","d c d"
      .select(Dedup.shingles($"text", 3).as("sh")).head().getSeq[String](0)
    assert(out === Seq("a b c", "b c d", "c d c", "d c d"))
    // shorter than n → empty, not an error
    val short = docs((2L, "a b")).select(Dedup.shingles($"text", 3)).head().getSeq[String](0)
    assert(short.isEmpty)
  }

  test("exact dedup keeps the smallest id per key and counts dups") {
    val out = Dedup.exact(docs((5L, "same"), (2L, "same"), (9L, "other")), $"text")
      .collect().map(r => r.getString(1) -> (r.getLong(0), r.getLong(2))).toMap
    assert(out === Map("same" -> (2L, 2L), "other" -> (9L, 1L)))
  }

  test("ngram Jaccard finds planted near-dups and nothing else") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val nearDup = "alpha beta gamma delta epsilon zeta eta theta iota lambda" // one token changed
    val unrelated = "one two three four five six seven eight nine ten"
    val pairs = Dedup.ngramJaccardPairs(
      docs((1L, base), (2L, nearDup), (3L, unrelated)), n = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq === Seq((1L, 2L))) // 6 shared of 10 distinct shingles = 0.6
  }

  test("dropNearDups: keep-first rule, chains don't over-delete") {
    import org.apache.spark.sql.functions.col
    val docs = Seq((1L, "x"), (2L, "x"), (3L, "x"), (4L, "y")).toDF("doc_id", "text")
    // pairs: 1~2, 2~3 (chain), 1!~3 → drop 2 and 3? No: drop b-side only → 2 (from 1~2) and 3 (from 2~3)
    val pairs = Seq((1L, 2L, 0.9), (2L, 3L, 0.9)).toDF("a", "b", "jaccard")
    val kept = Dedup.dropNearDups(docs, pairs).select(col("doc_id")).as[Long].collect().sorted
    assert(kept.toSeq === Seq(1L, 4L))
    // no pair list → everything kept
    val none = Seq.empty[(Long, Long, Double)].toDF("a", "b", "jaccard")
    assert(Dedup.dropNearDups(docs, none).count() === 4)
  }

  test("cluster policy: chains merge to one survivor; keep-first keeps chain ends") {
    import org.apache.spark.sql.functions.col
    val docs = Seq((1L, "w"), (2L, "x"), (3L, "y"), (4L, "z"), (6L, "v"), (5L, "u"))
      .toDF("doc_id", "text")
    // chain 1~2~3 (1 !~ 3) and isolated pair 5~6; doc 4 untouched
    val pairs = Seq((1L, 2L, 0.9), (2L, 3L, 0.9), (5L, 6L, 0.9)).toDF("a", "b", "jaccard")
    val clusters = Dedup.nearDupClusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L))
    val keptCluster = Dedup.dropNearDupsByCluster(docs, pairs)
      .select(col("doc_id")).as[Long].collect().sorted.toSeq
    assert(keptCluster === Seq(1L, 4L, 5L)) // one survivor per component
    val keptFirst = Dedup.dropNearDups(docs, pairs)
      .select(col("doc_id")).as[Long].collect().sorted.toSeq
    assert(keptFirst === Seq(1L, 4L, 5L)) // b-side drop: 2,3,6 dropped here too
    // where the policies genuinely differ — a "hub" component
    // 1~3, 2~3 (1 !~ 2): keep-first drops only the b-side {3},
    // keeping both 1 and 2; the cluster policy merges {1,2,3} and
    // keeps only the minimum
    val hub = Seq((1L, 3L, 0.9), (2L, 3L, 0.9)).toDF("a", "b", "jaccard")
    val d2 = Seq((1L, "p"), (2L, "q"), (3L, "r")).toDF("doc_id", "text")
    assert(Dedup.dropNearDups(d2, hub).select(col("doc_id")).as[Long].collect().sorted.toSeq === Seq(1L, 2L))
    assert(Dedup.dropNearDupsByCluster(d2, hub).select(col("doc_id")).as[Long].collect().sorted.toSeq === Seq(1L))
    // the distributed min-label loop (forced via maxLocalEdges = 0)
    // must agree with the driver-side union-find fast path
    val dist = Dedup.nearDupClusters(pairs, maxLocalEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist === clusters)
  }

  test("dfCap: capped equals uncapped when no shingle exceeds the cap") {
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val uncapped = Dedup.ngramJaccardPairs(d, 3, 0.8, dfCap = None)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val capped = Dedup.ngramJaccardPairs(d, 3, 0.8, dfCap = Some(100))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(uncapped.nonEmpty && capped === uncapped)
  }

  test("dfCap: capped Jaccard is a conservative lower bound (boilerplate fixture)") {
    // every doc shares the boilerplate prefix "std hdr tok" (df = 4 > cap = 2);
    // capped semantics (round 4): numerator over the capped universe,
    // denominators full-set → a LOWER BOUND of true jaccard, so shared
    // boilerplate can never inflate similarity into a false near-dup
    val boiler = "std hdr tok"
    val d = docs(
      (1L, s"$boiler alpha beta gamma delta"),
      (2L, s"$boiler alpha beta gamma epsilon"),
      (3L, s"$boiler one two three four"),
      (4L, s"$boiler nine eight seven six"))
    val out = Dedup.ngramJaccardPairs(d, 3, threshold = 0.3, dfCap = Some(2))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // "std hdr tok" (df 4 > 2) is dropped from the numerator only:
    // doc1 ∩ doc2 capped = {hdr tok alpha, tok alpha beta, alpha beta gamma}
    // inter = 3, na = nb = 5 (full) → jaccard = 3/7, below the true
    // uncapped 4/6 — a lower bound
    assert(out.keySet === Set((1L, 2L)))
    assert(math.abs(out((1L, 2L)) - 3.0 / 7.0) < 1e-12)
    // docs 3/4 overlap ONLY in boilerplate → they must not pair at all
    assert(!out.keySet.exists(p => p._1 >= 3L || p._2 >= 3L))
    // and the bound property itself: capped ≤ uncapped for the same pair
    val uncapped = Dedup.ngramJaccardPairs(d, 3, threshold = 0.3, dfCap = None)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out((1L, 2L)) <= uncapped((1L, 2L)))
  }

  test("minhash+LSH near-dups match exact Jaccard on sf0.001 documents") {
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val exact = Dedup.ngramJaccardPairs(d, 3, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Dedup.minhashNearDups(d, 3, 128, 16, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture should contain planted near-dups")
    assert(approx === exact)
  }

  test("minhash signatures are deterministic across runs") {
    val d = docs((1L, "a b c d e f g h"), (2L, "x y z w v u t s"))
    val s1 = Dedup.minhashSignatures(d, 3, 16).orderBy("doc_id").collect().map(_.getSeq[Long](1))
    val s2 = Dedup.minhashSignatures(d, 3, 16).orderBy("doc_id").collect().map(_.getSeq[Long](1))
    assert(s1.toSeq === s2.toSeq)
    assert(s1.head !== s1(1)) // different docs → different signatures
  }

  test("identical shingle sets → identical minhash signature and hamming-0 simhash") {
    val d = docs((1L, "p q r s t u"), (2L, "p q r s t u"))
    val sigs = Dedup.minhashSignatures(d, 3, 32).collect().map(_.getSeq[Long](1))
    assert(sigs(0) === sigs(1))
    val near = Dedup.simhashNearDups(d, 3, maxHamming = 3).collect()
    assert(near.length === 1 && near.head.getInt(2) === 0)
  }

  test("simhash near-dup pair set equals brute-force hamming<=3 on sf0.001 documents") {
    // teeth for the oracle-less q_dedup_simhash: the pigeonhole chunk
    // join generates a candidate SUPERSET of all hamming<=k pairs and
    // verifies each with bit_count, so the result must EQUAL the all-
    // pairs scan over the same fingerprints — any chunking bug (wrong
    // widths, missed chunk) loses pairs and fails this
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val fps = Dedup.simhash(d, 3).collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (a, ha) <- fps; (b, hb) <- fps if a < b
      if java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (a, b)).toSet
    val got = Dedup.simhashNearDups(d, 3, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty, "fixture should contain simhash near-dups")
    assert(got === brute)
  }

  test("md5-simhash pair set equals brute-force hamming<=3 over its own fingerprints") {
    // X179's pigeonhole-exactness claim: 4x15-bit banding finds EVERY
    // pair within 3 flips of the 60-bit md5 fingerprint (recall 1.0,
    // unlike the probabilistic MinHash LSH) — so the banded result
    // must equal the all-pairs scan. Fingerprints recomputed here
    // independently from the same md5 construction.
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    import org.apache.spark.sql.functions._
    val ex = d.select(col("doc_id"), explode(Dedup.shingles(col("text"), 3)).as("s"))
      .select(col("doc_id"),
        conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long").as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val fps = ex.groupBy(_._1).map { case (id, rows) =>
      val bits = (0 until 60).map { j =>
        val vote = rows.map(r => if (((r._2 >> j) & 1L) == 1L) 1L else -1L).sum
        if (vote > 0) 1L << j else 0L
      }.sum
      (id, bits)
    }.toArray
    val brute = (for {
      (a, ha) <- fps; (b, hb) <- fps if a < b
      if java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (a, b)).toSet
    val got = Dedup.simhashNearDupsMd5(d, 3, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty, "fixture should contain md5-simhash near-dups")
    assert(got === brute)
  }

  test("simhash near-dups: small edit stays within hamming 3, unrelated text does not") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val edited = ((1 to 39).map(i => s"tok$i") :+ "tokX").mkString(" ")
    val other = (100 to 140).map(i => s"w$i").mkString(" ")
    val out = Dedup.simhashNearDups(docs((1L, base), (2L, edited), (3L, other)), 3, 6)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq === Seq((1L, 2L)))
  }

  test("duplicateSpans: planted shared span flagged, unique and short docs zeroed") {
    // A and B share a 12-token run embedded in otherwise-unrelated text:
    // with w=5, the run contributes 12-5+1 = 8 shared interior windows
    val span = (1 to 12).map(i => s"s$i").mkString(" ")
    val a = s"a1 a2 a3 $span a4 a5 a6"
    val b = s"b1 b2 b3 b4 $span b5 b6"
    val c = (1 to 20).map(i => s"c$i").mkString(" ") // unique doc
    val d = "short doc" // < w tokens → zero windows
    val out = Dedup.duplicateSpans(docs((1L, a), (2L, b), (3L, c), (4L, d)), w = 5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // doc A: 18 tokens → 14 windows, 8 duplicated
    assert(out(1L)._1 === 14L && out(1L)._3 === 8L)
    assert(out(2L)._3 === 8L)
    assert(out(3L) === ((16L, 16L, 0L, 0.0)))
    assert(out(4L) === ((0L, 0L, 0L, 0.0)))
    assert(math.abs(out(1L)._4 - 8.0 / 14.0) < 1e-12)
  }

  test("duplicateSpans: within-doc repetition alone is not cross-doc duplication") {
    val rep = ((1 to 8) ++ (1 to 8)).map(i => s"r$i").mkString(" ")
    val other = (30 to 45).map(i => s"o$i").mkString(" ")
    val out = Dedup.duplicateSpans(docs((1L, rep), (2L, other)), w = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    // doc 1 repeats its own windows (distinct collapses them); no OTHER
    // doc shares them → nothing is cross-doc duplicated
    assert(out(1L) === 0L && out(2L) === 0L)
  }

  test("incrementalDedup: catalog hits dropped, min-id survives within increment") {
    val catalog = Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
    val incoming = Seq(
      (10L, "alpha"),   // already in catalog -> dropped
      (11L, "gamma"), (13L, "gamma"),  // new dup pair -> 11 survives, n_dups 2
      (12L, "delta")).toDF("doc_id", "text")
    val out = Dedup.incrementalDedup(incoming, catalog, org.apache.spark.sql.functions.col("text"))
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(11L, 12L))
    val byKey = out.map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(byKey("gamma") === 2L && byKey("delta") === 1L)
  }

  test("incrementalDedupBloom: bit-identical to the exact form (no false negatives)") {
    val catalog = Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
    val incoming = Seq(
      (10L, "alpha"), (11L, "gamma"), (13L, "gamma"), (12L, "delta"))
      .toDF("doc_id", "text")
    val key = org.apache.spark.sql.functions.col("text")
    val exact = Dedup.incrementalDedup(incoming, catalog, key)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    // a tight fpp AND an absurdly loose one: correctness must not
    // depend on the false-positive rate, only wire volume does
    for (fpp <- Seq(0.01, 0.5)) {
      val bloom = Dedup.incrementalDedupBloom(incoming, catalog, key,
          expectedKeys = 100L, fpp = fpp)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(bloom === exact, s"fpp=$fpp")
    }
    // NULL dedup keys must survive the Bloom screen exactly like the
    // anti-join treats them (null never matches the catalog → kept);
    // a null-propagating probe would silently drop the row
    val withNull = incoming.union(Seq((14L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val exactN = Dedup.incrementalDedup(withNull, catalog, key)
      .collect().map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(2))).toSet
    val bloomN = Dedup.incrementalDedupBloom(withNull, catalog, key, expectedKeys = 100L)
      .collect().map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(2))).toSet
    assert(exactN.exists(_._2.isEmpty), "fixture must exercise a null key")
    assert(bloomN === exactN, "bloom form diverged on a null dedup key")
  }

  test("incrementalDedupBloom: non-empty catalog with ALL-NULL keys is the first-crawl case") {
    // bloom_filter_agg over zero non-null values yields NULL, which the
    // pre-r8 guard (catalog.isEmpty) did not catch → NPE in the
    // bloomFilter builder. The guard must key on non-null-key
    // emptiness, and the result must equal the exact form's (an
    // anti-join against nothing keeps everything).
    val key = org.apache.spark.sql.functions.col("text")
    val allNullCatalog = Seq((1L, null.asInstanceOf[String]),
      (2L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val incoming = Seq((10L, "alpha"), (11L, "alpha"), (12L, "beta"))
      .toDF("doc_id", "text")
    val exact = Dedup.incrementalDedup(incoming, allNullCatalog, key)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val bloom = Dedup.incrementalDedupBloom(incoming, allNullCatalog, key,
        expectedKeys = 100L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(exact === Set((10L, "alpha", 2L), (12L, "beta", 1L)))
    assert(bloom === exact, "all-null-key catalog must behave like an empty one")
  }

  test("splitLeakage: exactly the near-dup pairs straddling a split boundary") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    // 40 near-identical docs: hash-split scatters them across
    // train/val/test, so some pairs straddle boundaries and some don't
    val d = (1L to 40L).map(i => (i, s"$base marker$i")).toDF("doc_id", "text")
    val leaks = Dedup.splitLeakage(d, n = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(3), r.getString(4))).toSet
    // independent recomposition: all pairs x the assignment
    val splits = TextAnalysis.splitAssign(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    val expected = Dedup.ngramJaccardPairs(d, n = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => splits(a) != splits(b) }
      .map { case (a, b) => (a, b, splits(a), splits(b)) }.toSet
    assert(leaks === expected)
    assert(leaks.nonEmpty, "fixture must actually produce straddling pairs")
    assert(leaks.forall { case (_, _, sa, sb) => sa != sb })
    // and the fixture must also have NON-straddling near-dup pairs,
    // or the filter was never exercised
    assert(Dedup.ngramJaccardPairs(d, n = 3, threshold = 0.5).count() > leaks.size)
  }

  test("md5 minhash: finds planted near-dups; every pair is exact-Jaccard true (precision 1.0)") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val nearDup = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
    val unrelated = "one two three four five six seven eight nine ten"
    val d = docs((1L, base), (2L, nearDup), (3L, unrelated), (4L, base + " extra"))
    val md5Pairs = Dedup.minhashNearDupsMd5(d, n = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // candidates are exact-verified, so every emitted pair must appear
    // in the brute-force exact pair set with the SAME jaccard
    val exact = Dedup.ngramJaccardPairs(d, n = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(md5Pairs.toSet.subsetOf(exact), "md5-minhash pair outside the exact set")
    // the planted high-jaccard pairs are found (recall at j>=0.7 with
    // 4x2 banding is >0.9; these fixtures sit well above threshold)
    assert(md5Pairs.exists(p => p._1 == 1L && p._2 == 2L))
    assert(md5Pairs.exists(p => p._1 == 1L && p._2 == 4L))
    // deterministic: a second run yields byte-identical output
    val again = Dedup.minhashNearDupsMd5(d, n = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(again.sorted.toSeq === md5Pairs.sorted.toSeq)
  }

  test("containment: embedded doc scores ~1 on its side while jaccard stays low") {
    val small = "alpha beta gamma delta epsilon" // 3 shingles, all inside big
    val big = small + " zeta eta theta iota kappa lambda mu nu xi omicron pi rho"
    val d = docs((1L, big), (2L, small), (3L, "totally different words here now"))
    val out = Dedup.ngramContainmentPairs(d, 3, threshold = 0.9).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getLong(0) === 1L && r.getLong(1) === 2L)
    assert(r.getDouble(3) === 1.0, "small doc wholly contained → c_ba = 1")
    assert(r.getDouble(2) < 0.3, "big doc is mostly its own content")
    // the same pair is invisible to jaccard at any useful threshold
    assert(Dedup.ngramJaccardPairs(d, 3, threshold = 0.5).collect().isEmpty)
  }

  test("shingleNovelty: first doc fully novel, duplicate fully stale, overlap partial") {
    val d = docs(
      (1L, "a b c d e"),      // 3 shingles, all first-seen
      (2L, "a b c d e"),      // identical → 0 novel
      (3L, "c d e f g"))      // shingles: "c d e" (seen), "d e f", "e f g" → 2/3 novel
    val out = Dedup.shingleNovelty(d, 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) === ((3L, 3L, 1.0)))
    assert(out(2L) === ((3L, 0L, 0.0)))
    assert(out(3L) === ((3L, 2L, 0.666667)))
  }

  test("passageDedup: first corpus occurrence survives, docs reassembled in order") {
    // k=2 chunks — doc 1: [a b][c d], doc 2: [a b][x y], doc 3: [x y][a b][z]
    val d = docs(
      (1L, "a b c d"),
      (2L, "a b x y"),
      (3L, "x y a b z"))
    val out = Dedup.passageDedup(d, k = 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // doc 1 owns "a b" and "c d"; doc 2 loses "a b" but owns "x y";
    // doc 3 loses both and keeps only its odd-length tail chunk "z"
    assert(out(1L) === ((2L, 2L, "a b c d")))
    assert(out(2L) === ((2L, 1L, "x y")))
    assert(out(3L) === ((3L, 1L, "z")))
    // intra-doc repeats dedup under the same first-occurrence rule,
    // and a doc whose chunks ALL lose reassembles to the empty string
    val d2 = docs((1L, "p q p q"), (2L, "p q"))
    val out2 = Dedup.passageDedup(d2, k = 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out2(1L) === ((2L, 1L, "p q")))
    assert(out2(2L) === ((1L, 0L, "")))
  }
}
