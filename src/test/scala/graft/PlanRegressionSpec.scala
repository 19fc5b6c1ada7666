package graft

import org.apache.spark.sql.DataFrame

/** Physical-plan regression guards: every hard-won plan property from
  * round-1 profiling, asserted so a refactor can't silently
  * reintroduce the shuffle/recompute it removed. Plans are built on
  * sf0.001 — plan SHAPE is scale-invariant (AQE may still re-pick
  * join strategies at runtime; these check the static plan).
  */
class PlanRegressionSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  // These are AT-SCALE contracts: materialization boundaries are
  // size-gated (graft.ops.Mat), and on sf0.001 the gate legitimately
  // lets shared subtrees recompute. Force every boundary ON while
  // building the plan so the assertions check the 100 TB shape.
  private def plan(q: String): String = {
    spark.conf.set(graft.ops.Mat.ConfKey, "0")
    try SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString
    finally spark.conf.unset(graft.ops.Mat.ConfKey)
  }
  private def exchanges(p: String): Int =
    "Exchange hashpartitioning".r.findAllIn(p).size

  test("as-of join: exactly one shuffle (union + window, no pre-agg exchange)") {
    assert(exchanges(plan("q_asof_join")) === 1)
  }

  test("co-occurrence edge build (integral): bounded-distinct agg — no window, no join") {
    val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_partkey")
    val p = ops.Graphs.coOccurrenceEdges(li, "l_orderkey", "l_partkey", 10)
      .queryExecution.executedPlan.toString
    assert(p.contains("bounded_distinct_long"), p.take(1500))
    assert(!p.contains("Window"), "integral fast path must not window-count group sizes")
    assert(!p.contains("Join"), "integral fast path must not self-join the membership")
  }

  test("wedge stage: shuffled-hash self-join — never sort-merge, never cartesian") {
    import spark.implicits._
    val edges = Seq((1, 2), (1, 3), (2, 3)).toDF("a", "b")
    val p = ops.Graphs.commonNeighbors(edges).queryExecution.executedPlan.toString
    assert(p.contains("ShuffledHashJoin"), p.take(1500))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p.take(1500))
  }

  test("compression ratio: pure per-row kernel — zero exchanges, codegen'd") {
    val p = plan("q_compression_ratio")
    assert(exchanges(p) === 0, p.take(1500))
    assert(p.contains("deflate_len"), p.take(1500))
  }

  test("stratified quota: exactly one shuffle (the per-source window rank)") {
    assert(exchanges(plan("q_stratified_sample")) === 1)
  }

  test("sessionize: exactly one shuffle (window partitioning reused by the aggregate)") {
    assert(exchanges(plan("q_sessionize")) === 1)
  }

  test("top-k per group: partial WindowGroupLimit before the exchange") {
    val p = plan("q_topk_group")
    assert(p.contains("WindowGroupLimit"))
    assert(p.indexOf("WindowGroupLimit") < p.lastIndexOf("WindowGroupLimit"), "expect partial+final")
  }

  test("projection pushdown: 2-column scan reads a 2-column schema") {
    val p = plan("q_project")
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_extendedprice:double>"), p)
  }

  test("bucketed join: co-located tables — zero exchanges through join AND keyed agg") {
    val p = plan("q_join_bucketed")
    assert(exchanges(p) === 0,
      s"bucketed join must not shuffle (bucket spec lost?):\n${p.take(2000)}")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p.take(500))
    assert(p.contains("SelectedBucketsCount"), "scan did not report bucketing:\n" + p.take(2000))
  }

  test("broadcast dim join: no shuffle of the fact side before the join") {
    val p = plan("q_join_bcast")
    assert(p.contains("BroadcastHashJoin"))
    // only the post-join aggregate shuffles (one exchange)
    assert(exchanges(p) <= 1, p)
  }

  test("banded MinHash: the signature kernel appears once per join side, not once per band") {
    val p = plan("q_dedup_minhash")
    val n = "minhash_band_keys".r.findAllIn(p).size
    assert(n <= 4, s"minhash_band_keys evaluated $n times — banding recompute regression:\n${p.take(2000)}")
  }

  test("ngram dedup: group-pairs shape — one corpus scan, one explode each side, ZERO joins") {
    val p = plan("q_dedup_ngram")
    // exactly two Generates: the corpus shingle explode and the
    // per-posting-list pair explode (which runs on grouped rows, not
    // the corpus); a third means the index is being rebuilt somewhere
    val generates = "Generate explode".r.findAllIn(p).size
    assert(generates === 2, s"expected 2 Generate explode nodes, got $generates:\n${p.take(2000)}")
    // sizes ride the posting lists, so no counts join — no join at all
    assert(!p.contains("Join"), s"group-pairs shape must be join-free:\n${p.take(2000)}")
    // one corpus scan: the documents parquet is read exactly once
    val scans = "FileScan parquet".r.findAllIn(p).size
    assert(scans === 1, s"expected 1 corpus scan, got $scans:\n${p.take(2000)}")
  }

  test("oov rate: vocab rides a broadcast join; one doc-grain shuffle only") {
    val p = plan("q_oov_rate")
    assert(p.contains("BroadcastHashJoin"), s"vocab must broadcast:\n${p.take(1500)}")
    assert(!p.contains("SortMergeJoin"), s"token-grain sort-merge join regression:\n${p.take(1500)}")
  }

  test("heavy hitters: the 1-row total broadcasts back over the counts") {
    val p = plan("q_heavy_hitters")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"total must broadcast, not shuffle:\n${p.take(1500)}")
  }

  test("calendar fill: spine explode + one asset-window shuffle, no cartesian") {
    val p = plan("q_gap_fill")
    assert(!p.contains("CartesianProduct"), p.take(1500))
    val generates = "Generate explode".r.findAllIn(p).size
    assert(generates === 1, s"expected 1 spine explode, got $generates:\n${p.take(1500)}")
  }

  test("simhash dedup: group-pairs shape — one chunk explode, ZERO joins, no distinct") {
    val p = plan("q_dedup_simhash")
    // one chunk explode + one per-bucket pair explode; verification
    // and cross-bucket dedup happen inside the bucket kernel, so the
    // old self-join + candidate-wide distinct must not reappear
    val generates = "Generate explode".r.findAllIn(p).size
    assert(generates === 2, s"expected 2 Generate explode nodes, got $generates:\n${p.take(2000)}")
    assert(!p.contains("Join"), s"group-pairs shape must be join-free:\n${p.take(2000)}")
    val scans = "FileScan parquet".r.findAllIn(p).size
    assert(scans === 1, s"expected 1 corpus scan, got $scans:\n${p.take(2000)}")
  }

  test("embedding near-dup: blocked equi-join — no nested-loop/cartesian, no corpus broadcast") {
    val p = plan("q_embed_neardup")
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(1500))
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(p.contains("ShuffledHashJoin"), p.take(1500))
  }

  test("embedding near-dup approx: banded candidates join on bucket key, no nested loop") {
    val p = plan("q_embed_neardup_lsh")
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(1500))
    assert(p.contains("ShuffledHashJoin"), p.take(1500))
  }

  test("bucketed semantic dedup: one materialized scan, shuffle-hash pair join, partial min") {
    val p = plan("q_semantic_dedup_bucketed")
    // the pair stage must be an equi-join on the bucket key, never a
    // nested loop, and the keep-first min must combine map-side
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(1500))
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(p.contains("ShuffledHashJoin"), p.take(1500))
    assert("partial_min|HashAggregate.*partial".r.findFirstIn(p).isDefined, p.take(1500))
  }

  test("repetition features: zero exchanges — pure per-row kernel, no corpus shuffle") {
    val p = plan("q_repetition")
    assert(exchanges(p) === 0, s"repetition must not shuffle:\n${p.take(1500)}")
    val kernels = "repetition_stats".r.findAllIn(p).size
    assert(kernels === 1, s"kernel must run once per row, found $kernels references:\n${p.take(1500)}")
  }

  test("json struct: props parsed once — one from_json feeding both k and k_map") {
    val p = plan("q_json_struct")
    val parses = "from_json".r.findAllIn(p).size
    assert(parses === 1, s"expected 1 from_json (single props parse), got $parses:\n${p.take(2000)}")
  }

  test("json variant: props parsed once into variant, typed get") {
    val p = plan("q_json_variant")
    val parses = "parseJson|parse_json".r.findAllIn(p).size
    assert(parses === 1, s"expected 1 parse_json, got $parses:\n${p.take(2000)}")
  }

  test("readPartitions lands the IN-filter in PartitionFilters (typed literals, no column cast)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_prune").toString
    import org.apache.spark.sql.functions._
    spark.range(100)
      .withColumn("date", date_add(lit(java.sql.Date.valueOf("2024-01-01")), (col("id") % 5).cast("int")))
      .write.mode("overwrite").partitionBy("date").parquet(tmp)
    val pruned = graft.store.Warehouse.readPartitions(spark, tmp, "date", Seq("2024-01-02", "2024-01-04"))
    val scan = pruned.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString("\n")
    val pf = scan.linesIterator.find(_.contains("PartitionFilters:")).getOrElse(scan)
    assert(pf.contains("date") && (pf.contains("IN") || pf.contains(" in(")), scan.take(2000))
    assert(pruned.count() === 40)
  }

  test("window indicators partition by asset (no single-partition total-order window)") {
    val p = SparkEntry.queries("q_ma7")(spark, dir).queryExecution.executedPlan.toString
    assert(p.contains("hashpartitioning(asset"), p.take(1500))
  }

  test("mixture sample / chunking: zero exchanges — pure per-row filter/explode") {
    assert(exchanges(plan("q_mixture_sample")) === 0)
    assert(exchanges(plan("q_chunk_text")) === 0)
  }

  test("unigram LM: vocab and total ride broadcasts; one corpus-token agg shuffle each side") {
    val p = plan("q_unigram_logp")
    assert("BroadcastExchange".r.findAllIn(p).size === 2, p.take(2000))
    assert(p.contains("BroadcastHashJoin") && p.contains("BroadcastNestedLoopJoin"),
      p.take(2000))
  }

  test("tfidf: df_t and doc count broadcast — no shuffle join on token") {
    val p = plan("q_tfidf_topk")
    assert("BroadcastExchange".r.findAllIn(p).size === 2, p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }

  test("stratified sample: one exchange (the per-source window), no global sort") {
    val p = plan("q_sample_per_source")
    assert(exchanges(p) === 1, p.take(2000))
    // SortExec prints as "Sort [keys], <global>, 0" — a true flag would
    // mean a total-order sort (single partition), the scale-killer
    assert(!"""Sort \[[^\]]*\], true,""".r.findFirstIn(p).isDefined, p.take(2000))
  }

  test("duplicate spans: ONE kernel pass, two shuffles, ZERO joins") {
    val p = plan("q_dup_spans")
    // stats ride the exploded rows, so the rolling-hash kernel (and the
    // corpus scan under it) must appear exactly once — a second scan
    // means per-doc stats grew their own plan branch (the r2 ngram bug)
    val scans = "FileScan parquet".r.findAllIn(p).size
    assert(scans === 1, s"expected 1 corpus scan, got $scans:\n${p.take(2000)}")
    assert(!p.contains("Join"), s"span profile must be join-free:\n${p.take(2000)}")
    assert(exchanges(p) === 2, s"expected window + doc shuffles only:\n${p.take(2000)}")
  }

  test("PQ ANN: broadcast sweep/rerank — only the two per-query top-k windows shuffle, pre-limited") {
    val p = plan("q_ann_pq")
    // the ADC cross and the shortlist/query rerank joins are all
    // broadcast-side: no shuffle join anywhere
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"), p.take(2000))
    // the only exchanges are the approx and exact top-k windows on
    // query_id, and both rank streams are cut to k per partition
    // BEFORE the wire by partial WindowGroupLimit
    assert(exchanges(p) <= 2, p.take(2000))
    assert(p.contains("WindowGroupLimit"), p.take(2000))
  }

  test("scd2: both window passes share ONE shuffle on the dimension key") {
    assert(exchanges(plan("q_scd2")) === 1, plan("q_scd2").take(2000))
  }

  test("rank family: fact side never sorts — ranks broadcast-joined from key grain") {
    val p = plan("q_rank_funcs")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    // the only Sort allowed is the key-distinct window's (≤150 rows);
    // a Sort whose ordering mentions l_orderkey means the fact sorted
    assert(!p.contains("Sort [l_orderkey"), p.take(2000))
    // one exchange for the count agg + one for the tiny window
    assert(exchanges(p) <= 2, p.take(2000))
  }

  test("epoch shuffle: no window, no hash shuffle — positions come off the RDD pass") {
    // the range partitioning lives behind globalIndex's RDD boundary
    // (Scan ExistingRDD), so the visible plan must be JUST a project
    // over it: any Window or hash exchange here means the positions
    // regressed to a window formulation
    val p = plan("q_epoch_shuffle")
    assert(p.contains("Scan ExistingRDD"), p.take(2000))
    assert(!p.contains("Window"), s"epoch positions must not use a window:\n${p.take(2000)}")
    assert(exchanges(p) === 0, p.take(2000))
  }

  test("bigram LM: count joins broadcast — corpus never shuffles at bigram grain") {
    val p = plan("q_bigram_logp")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"), p.take(2000))
    // bigram counts + context counts + vocab + the final doc-grain agg
    assert(exchanges(p) <= 4, p.take(2000))
  }

  test("ma crossover: the MA windows and the state lag share ONE (asset) shuffle") {
    // exchange 1: the daily OHLC aggregate; exchange 2: the (asset)
    // window partitioning, reused by maF/maS AND the post-filter lag
    assert(exchanges(plan("q_ma_cross")) === 2, plan("q_ma_cross").take(2000))
  }

  test("moments: two mergeable passes, mean joined broadcast") {
    val p = plan("q_moments")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"), p.take(2000))
  }

  test("trend fit: ONE partial-agg pass, no join/window, pruned scan") {
    val p = plan("q_trend_fit")
    assert(p.contains("partial_regr_slope"), p.take(2000))
    assert(exchanges(p) === 1, p.take(2000))
    assert(!p.contains("Join") && !p.contains("Window"), p.take(2000))
    // ts surfaces as bigint (legacy nanos testdata), timestamp_ntz
    // (regenerated µs testdata), or plain timestamp (µs with
    // isAdjustedToUTC=true) — all handled by Tables.tsToTimestamp;
    // either way the scan must be pruned to exactly these three columns
    assert(p.contains("event_type:string,value:double>"), p.take(2000))
    assert("ReadSchema: struct<ts:(bigint|timestamp_ntz|timestamp)".r.findFirstIn(p).nonEmpty, p.take(2000))
  }

  test("event transitions: one event-grain shuffle (user adjacency), aggs at pair grain") {
    // exchange 1: hashpartitioning(user_id) for the lag; exchanges 2-3:
    // the |types|²-grain pair count + normalization window — tiny
    assert(exchanges(plan("q_event_transitions")) === 3, plan("q_event_transitions").take(2500))
  }

  test("value histogram: min/max stats broadcast back, no event-grain join shuffle") {
    val p = plan("q_value_histogram")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"), p.take(2000))
    assert(exchanges(p) === 2, p.take(2000)) // stats agg + (group,bin) count agg
  }

  test("merge into: ONE keyed full-outer join, no extra pass over either side") {
    val p = plan("q_merge")
    assert("FullOuter".r.findAllIn(p).size === 1, p.take(2500))
    // the merge itself: both sides shuffle onto the merge keys (2);
    // the other 2 belong to the scenario's inputs (enriched's
    // indicator window, dailyOhlc's aggregate), not to mergeInto
    assert(exchanges(p) <= 4, p.take(2500))
  }

  test("cdc diff: ONE keyed full-outer join + null-safe struct compare, no hashing pass") {
    val p = plan("q_cdc_diff")
    assert("FullOuter".r.findAllIn(p).size === 1, p.take(2500))
    assert(exchanges(p) <= 2, p.take(2500))
    assert(!p.toLowerCase.contains("md5") && !p.contains("xxhash"), p.take(2500))
  }

  test("AQE skew-join: a runtime-skewed sort-merge join is split (skew=true in the final plan)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // one hot key carries ~75% of the fact side; thresholds lowered so
    // test-sized partitions register as skewed (the defaults are tuned
    // for 256 MB partitions). This pins the X35 contract: for a plain
    // equi-JOIN, AQE's runtime split handles the hot key and the
    // manual salt is unnecessary — saltedJoin remains for what AQE
    // cannot split (hot AGGREGATION keys; a single key bigger than a
    // task's build side).
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16384",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val fact = spark.range(200000).toDF("id")
        .withColumn("k", when($"id" % 4 =!= 0, lit(7L)).otherwise($"id" % 1000))
        .withColumn("pad", md5($"id".cast("string")))
      val dim = spark.range(1000).toDF("k").withColumn("tier", $"k" % 5)
      val joined = fact.join(dim, Seq("k"))
      // execute THIS QueryExecution (a write/count would plan a fresh
      // one and leave this plan un-finalized) so AQE replans it
      joined.queryExecution.toRdd.foreach(_ => ())
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        s"expected the runtime skew split in the final adaptive plan:\n${p.take(3000)}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("incremental agg: states partial-combine map-side before their key shuffles") {
    val p = plan("q_incr_agg")
    // two batch states + the merge re-aggregate — each one exchange
    assert(exchanges(p) <= 3, p.take(2500))
    assert(p.contains("partial_count") || p.contains("partial count"), p.take(2500))
    assert(!p.contains("Join"), p.take(2500)) // merge is union+agg, never a join
  }

  test("md5 bloom screen: the bit set is broadcast — the corpus probe never sort-merges") {
    val p = plan("q_decontam_bloom_md5")
    assert(p.contains("BroadcastHashJoin"), p.take(2500))
    assert(!p.contains("SortMergeJoin"), p.take(2500))
  }

  test("dv delete read: position subtraction is a broadcast anti-join, never sort-merge") {
    val p = plan("q_delete_dv")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"), p.take(2500))
    assert(!p.contains("SortMergeJoin"), p.take(2500))
  }

  test("join IVM: both delta joins broadcast the feed side") {
    val p = plan("q_incr_join_cdf")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p.take(2500))
  }

  test("perplexity bucket: LM model joins stay broadcast; the cut is one ntile window") {
    val p = plan("q_perplexity_bucket")
    // bigram counts, context counts, vocab (cross), doc-grain lang join
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3, p.take(2500))
    assert(p.contains("ntile(3)"), p.take(2500))
  }

  test("priority sample: distributed top-k (TakeOrdered), no global sort, 1-row τ broadcast") {
    // the only full-data pass is the priority scan; the top-(k+1) is a
    // TakeOrderedAndProject (per-partition heaps + driver merge, never
    // a range-partitioned global sort), and τ joins back as a 1-row
    // broadcast nested loop — no shuffle of the kept rows
    val keptPlan = {
      spark.conf.set(graft.ops.Mat.ConfKey, "0")
      try {
        val d = graft.Tables.documents(spark, dir)
          .select(org.apache.spark.sql.functions.col("doc_id"),
            org.apache.spark.sql.functions.length(
              org.apache.spark.sql.functions.col("text")).as("w"))
        ext.Sketches.prioritySample(d, "doc_id", "w", k = 100)
          .queryExecution.executedPlan.toString
      } finally spark.conf.unset(graft.ops.Mat.ConfKey)
    }
    assert(keptPlan.contains("TakeOrderedAndProject"), keptPlan.take(2500))
    assert(!keptPlan.contains("Exchange rangepartitioning"), keptPlan.take(2500))
    assert(keptPlan.contains("BroadcastNestedLoopJoin"), keptPlan.take(2500))
  }

  test("autocorr: ONE window pass materializes all lags (single asset-grain sort)") {
    val p = plan("q_autocorr")
    // one window shuffle (asset) + one aggregate shuffle; the stack
    // melt is a projection, not per-lag window sorts
    assert(exchanges(p) <= 2, p.take(2500))
    assert("WindowExec|Window".r.findAllIn(p).size >= 1)
  }

  test("adamic-adar: shuffled-hash wedge join, never sort-merge or cartesian (X242)") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("a", "b")
    val p = ops.Graphs.adamicAdar(edges).queryExecution.executedPlan.toString
    assert(p.contains("ShuffledHashJoin"), p.take(1500))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p.take(1500))
  }

  test("joinSnapshots: manifest-only broadcast decision, poison-pinned (r13)") {
    import spark.implicits._
    val dim = java.nio.file.Files.createTempDirectory("graft_js_dim").toString + "/t"
    val fact = java.nio.file.Files.createTempDirectory("graft_js_fact").toString + "/t"
    graft.store.Warehouse.writeSnapshot(
      (1 to 50).map(i => (i.toLong, s"n$i")).toDF("k", "name"), dim)
    graft.store.Warehouse.writeSnapshot(
      (1 to 5000).map(i => (i.toLong % 50, i.toLong)).toDF("k", "v"), fact)
    // poison pin: corrupt every DATA file — the broadcast decision and
    // the plan build must cost zero data bytes (manifest-only)
    Seq(dim, fact).foreach { root =>
      new java.io.File(root).listFiles
        .filter(f => f.isDirectory && f.getName.startsWith("v="))
        .flatMap(_.listFiles)
        .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
        .foreach { f =>
          val out = new java.io.FileOutputStream(f)
          out.write("not parquet".getBytes); out.close()
        }
    }
    // disable the planner's own file-size broadcasting so the strategy
    // seen below is OURS (corrupt stub files look tiny to the planner)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // dim: 50 rows x 28B default width = 1400 <= 64k -> broadcast it
      val p1 = graft.store.Warehouse.joinSnapshots(spark, fact, dim, Seq("k"),
          broadcastThreshold = Some(64 * 1024))
        .queryExecution.sparkPlan.toString
      assert(p1.contains("BroadcastHashJoin"), p1.take(1500))
      // both sides over the threshold -> plain join, planner picks
      val p2 = graft.store.Warehouse.joinSnapshots(spark, fact, dim, Seq("k"),
          broadcastThreshold = Some(1))
        .queryExecution.sparkPlan.toString
      assert(!p2.contains("BroadcastHashJoin"), p2.take(1500))
      assert(p2.contains("SortMergeJoin") || p2.contains("ShuffledHashJoin"), p2.take(1500))
      // LEFT OUTER can only build right: a small LEFT side is not a
      // legal build side, so no hint lands (fact stays over threshold)
      val p3 = graft.store.Warehouse.joinSnapshots(spark, dim, fact, Seq("k"),
          joinType = "left", broadcastThreshold = Some(64 * 1024))
        .queryExecution.sparkPlan.toString
      assert(!p3.contains("BroadcastHashJoin"), p3.take(1500))
      // ...while a small RIGHT side under LEFT OUTER is legal
      val p4 = graft.store.Warehouse.joinSnapshots(spark, fact, dim, Seq("k"),
          joinType = "left", broadcastThreshold = Some(64 * 1024))
        .queryExecution.sparkPlan.toString
      assert(p4.contains("BroadcastHashJoin"), p4.take(1500))
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("joinSnapshots: synopsis-certified SHUFFLE_HASH, SMJ fallback without synopses, zero data I/O (r14)") {
    import spark.implicits._
    val dim = java.nio.file.Files.createTempDirectory("graft_sh_dim").toString + "/t"
    val fact = java.nio.file.Files.createTempDirectory("graft_sh_fact").toString + "/t"
    graft.store.Warehouse.writeSnapshot(
      (1 to 50).map(i => (i.toLong, s"n$i")).toDF("k", "name"), dim)
    graft.store.Warehouse.writeSnapshot(
      (1 to 5000).map(i => (i.toLong % 50, i.toLong)).toDF("k", "v"), fact)
    // WITHOUT synopses: neither side under threshold -> no certified
    // build side -> plain join, the planner's machinery decides
    val a0 = graft.store.Warehouse.joinAdvice(spark, fact, dim, Seq("k"),
      broadcastThreshold = Some(1))
    assert(a0.strategy === "shuffle", a0.toString)
    // analyze the would-be build side: per-key cardinality on dim.k is
    // 1 row/key (50 rows, 50 distinct) - bounded, SHUFFLE_HASH-safe
    graft.store.Warehouse.analyzeSnapshot(spark, dim, Seq("k"), k = 64)
    assert(graft.store.Warehouse.recordedNdv(spark, dim, "k").exists(n =>
      n > 40.0 && n <= 60.0))
    // r15 hub veto: the average bound alone no longer certifies — a
    // hub key can hide behind a passing mean. No recorded histogram →
    // skew cannot be ruled out → plain join.
    assert(graft.store.Warehouse.joinAdvice(spark, fact, dim, Seq("k"),
      broadcastThreshold = Some(1)).strategy === "shuffle",
      "without a histogram the build side must not be hub-certified")
    graft.store.Warehouse.analyzeHistogram(spark, dim, "k", bins = 20)
    assert(graft.store.Warehouse.recordedMaxBinRows(spark, dim, "k").exists(_ <= 5L))
    // poison pin BEFORE the decision: the strategy must come from the
    // manifests + the _synopses side table, never the data files
    Seq(dim, fact).foreach { root =>
      new java.io.File(root).listFiles
        .filter(f => f.isDirectory && f.getName.startsWith("v="))
        .flatMap(_.listFiles)
        .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
        .foreach { f =>
          val out = new java.io.FileOutputStream(f)
          out.write("not parquet".getBytes); out.close()
        }
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val a1 = graft.store.Warehouse.joinAdvice(spark, fact, dim, Seq("k"),
        broadcastThreshold = Some(1))
      assert(a1.strategy === "shuffle_hash_right", a1.toString)
      val p1 = graft.store.Warehouse.joinSnapshots(spark, fact, dim, Seq("k"),
          broadcastThreshold = Some(1))
        .queryExecution.sparkPlan.toString
      assert(p1.contains("ShuffledHashJoin"), p1.take(1500))
      assert(!p1.contains("SortMergeJoin"), p1.take(1500))
      // LEFT OUTER onto dim can only build right: dim IS the right
      // side, so the certified hint still lands
      assert(graft.store.Warehouse.joinAdvice(spark, fact, dim, Seq("k"),
        joinType = "left", broadcastThreshold = Some(1)).strategy === "shuffle_hash_right")
      // ...but RIGHT OUTER can only build left (fact: uncertified) -
      // no hint
      assert(graft.store.Warehouse.joinAdvice(spark, fact, dim, Seq("k"),
        joinType = "right", broadcastThreshold = Some(1)).strategy === "shuffle")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("vector-index probe: broadcast probe join on cell, never cartesian or sort-merge (X247)") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_vidx_plan").toString + "/t"
    val corpus = (10L until 200L).map(i =>
      (i, (0 until 8).map(d => (i * 0.1 + d).toFloat))).toDF("vec_id", "embedding")
    val queries = (0L until 5L).map(i =>
      (i, (0 until 8).map(d => (i * 0.2 + d).toFloat))).toDF("vec_id", "embedding")
    graft.ext.VectorIndex.buildIvfIndex(corpus, root, nlist = 8, bucketed = true)
    val p = graft.ext.VectorIndex.ivfTopKIndexed(queries, root, k = 5, nprobe = 3)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"), p.take(1500))
    // r16 filtered probe: the attr predicate must REACH the parquet
    // scan (row-group skipping inside probed cells), not evaluate
    // post-scan only — the X261 claim at the plan level
    val aroot = java.nio.file.Files.createTempDirectory("graft_vidx_aplan").toString + "/t"
    import org.apache.spark.sql.functions.{col, lit, pmod, when}
    val attrCorpus = corpus.withColumn("lang",
      when(pmod(col("vec_id"), lit(2)) === 0, "en").otherwise("de"))
    graft.ext.VectorIndex.buildIvfIndex(attrCorpus, aroot, nlist = 8, bucketed = true)
    val fdf = graft.ext.VectorIndex.ivfTopKIndexed(queries, aroot, k = 5, nprobe = 3,
      where = Some(col("lang") === "en"))
    // assert on the scan NODE, not the plan string (string formats
    // shift with session state — attribute-id width, printer
    // truncation): the attr predicate must be among the scan's own
    // data filters, i.e. evaluated inside the pruned read
    val scans = fdf.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    val indexScan = scans.filter(_.relation.location.rootPaths
      .exists(_.toString.contains("graft_vidx_aplan")))
    assert(indexScan.nonEmpty, s"no FileSourceScan over the attr index among ${scans.size} scans")
    assert(indexScan.exists(_.dataFilters.exists(
        _.references.exists(_.name == "lang"))),
      indexScan.map(_.dataFilters.mkString(";")).mkString(" | "))
  }

  test("joinAdvice: surfaces (never applies) a salt recommendation on a hot probe key (r14)") {
    import spark.implicits._
    val dim = java.nio.file.Files.createTempDirectory("graft_sk_dim").toString + "/t"
    val hot = java.nio.file.Files.createTempDirectory("graft_sk_hot").toString + "/t"
    graft.store.Warehouse.writeSnapshot(
      (1 to 10).map(i => (i.toLong, s"n$i")).toDF("k", "name"), dim)
    // 5000 rows over 2 distinct keys: 2500 rows/key on the probe side
    graft.store.Warehouse.writeSnapshot(
      (1 to 5000).map(i => (i.toLong % 2, i.toLong)).toDF("k", "v"), hot)
    graft.store.Warehouse.analyzeSnapshot(spark, dim, Seq("k"), k = 64)
    graft.store.Warehouse.analyzeSnapshot(spark, hot, Seq("k"), k = 64)
    val a = graft.store.Warehouse.joinAdvice(spark, hot, dim, Seq("k"),
      broadcastThreshold = Some(1))
    assert(a.saltAdvice.exists(_.contains("salting")), a.toString)
    // the advice is informational: the built plan carries no salt
    // rewrite (key columns unchanged)
    val cols = graft.store.Warehouse.joinSnapshots(spark, hot, dim, Seq("k"),
      broadcastThreshold = Some(1)).columns.toSeq
    assert(cols === Seq("k", "v", "name"), cols.toString)
    // a cool probe key (50 distinct over 5000 rows = 100/key) stays
    // below the advise bound
    val factCool = java.nio.file.Files.createTempDirectory("graft_sk_cool").toString + "/t"
    graft.store.Warehouse.writeSnapshot(
      (1 to 5000).map(i => (i.toLong % 50, i.toLong)).toDF("k", "v"), factCool)
    graft.store.Warehouse.analyzeSnapshot(spark, factCool, Seq("k"), k = 64)
    assert(graft.store.Warehouse.joinAdvice(spark, factCool, dim, Seq("k"),
      broadcastThreshold = Some(1)).saltAdvice.isEmpty)
    // a plain SHUFFLE (no certified build) has no build side: the hot
    // key must be flagged regardless of which side carries it — here
    // the RIGHT side is hot while the left is cool and uncertified
    val a2 = graft.store.Warehouse.joinAdvice(spark, factCool, hot, Seq("k"),
      broadcastThreshold = Some(1))
    assert(a2.strategy === "shuffle", a2.toString)
    assert(a2.saltAdvice.exists(_.contains(hot)), a2.toString)
  }

  test("joinAdvice: a range-sliced side broadcasts by the X246 selectivity, zero data I/O (r15)") {
    import spark.implicits._
    val dim = java.nio.file.Files.createTempDirectory("graft_rng_dim").toString + "/t"
    val fact = java.nio.file.Files.createTempDirectory("graft_rng_fact").toString + "/t"
    graft.store.Warehouse.writeSnapshot(
      (1 to 20000).map(i => (i.toLong % 50, i.toDouble)).toDF("k", "v"), fact)
    graft.store.Warehouse.writeSnapshot(
      (1 to 5000).map(i => (i.toLong % 50, i.toLong)).toDF("k", "w"), dim)
    graft.store.Warehouse.analyzeHistogram(spark, fact, "v", bins = 20)
    // poison pin BEFORE the decision: range sizing must come from the
    // manifest + the recorded histogram, never the data files
    Seq(dim, fact).foreach { root =>
      new java.io.File(root).listFiles
        .filter(f => f.isDirectory && f.getName.startsWith("v="))
        .flatMap(_.listFiles)
        .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
        .foreach { f =>
          val out = new java.io.FileOutputStream(f)
          out.write("not parquet".getBytes); out.close()
        }
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val thr = Some(64L * 1024)
      // whole fact is far over the threshold: the unfiltered ladder
      // cannot broadcast either side
      val a0 = graft.store.Warehouse.joinAdvice(spark, fact, dim, Seq("k"), "inner", thr)
      assert(a0.strategy === "shuffle", a0.toString)
      // the declared 5% slice scales the byte estimate under the
      // threshold -> the filtered fact side broadcasts
      val a1 = graft.store.Warehouse.joinAdvice(spark, fact, dim, Seq("k"), "inner", thr,
        leftRange = Some(("v", 0.0, 1000.0)))
      assert(a1.strategy === "broadcast_left", a1.toString)
      assert(a1.leftBytesEst.exists(b => b > 0 && b <= 64L * 1024), a1.toString)
      val p = graft.store.Warehouse.joinSnapshots(spark, fact, dim, Seq("k"), "inner", thr,
          leftRange = Some(("v", 0.0, 1000.0)))
        .queryExecution.sparkPlan.toString
      assert(p.contains("BroadcastHashJoin"), p.take(1500))
      // a slice on a column with NO recorded histogram DECLINES — the
      // estimate must never guess a filtered side small
      val a2 = graft.store.Warehouse.joinAdvice(spark, fact, dim, Seq("k"), "inner", thr,
        leftRange = Some(("v", 0.0, 1000.0)), rightRange = Some(("w", 0.0, 10.0)))
      assert(a2.rightBytesEst.isEmpty, a2.toString)
      assert(a2.strategy === "broadcast_left", a2.toString)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("joinAdvice: a boundary-bin-concentrated slice sizes by the UPPER bound (r16)") {
    import spark.implicits._
    val dim = java.nio.file.Files.createTempDirectory("graft_ub_dim").toString + "/t"
    val fact = java.nio.file.Files.createTempDirectory("graft_ub_fact").toString + "/t"
    // 20000 rows; 19000 of them concentrate at v=4.5 — inside bin 0 of
    // the [0,100] 20-bin histogram (width 5, the planner-consult
    // default family) but OUTSIDE the declared [0,1] slice. Linear
    // proration would size the slice at ~bin0/5 ≈ 3800 rows; the true
    // upper bound is bin 0 whole (≈19002). A broadcast decision
    // scaling by proration would hint a ~19000-row side small — the
    // exact OOM-guess the r15 ADVICE flags.
    val vs = Seq(0.0, 100.0) ++ Seq.fill(19000)(4.5) ++
      (1 to 998).map(i => 10.0 + (i % 90).toDouble)
    graft.store.Warehouse.writeSnapshot(
      vs.zipWithIndex.map { case (v, i) => (i.toLong % 50, v) }.toDF("k", "v"), fact)
    graft.store.Warehouse.writeSnapshot(
      (1 to 20000).map(i => (i.toLong % 50, i.toLong)).toDF("k", "w"), dim)
    graft.store.Warehouse.analyzeHistogram(spark, fact, "v", bins = 20)
    val a0 = graft.store.Warehouse.joinAdvice(spark, fact, dim, Seq("k"),
      broadcastThreshold = Some(1))
    val whole = a0.leftBytesEst.get
    // threshold between the prorated guess (~19% of whole) and the
    // upper bound (~95%): proration would broadcast, the bound must not
    val thr = Some(whole * 4 / 10)
    val a1 = graft.store.Warehouse.joinAdvice(spark, fact, dim, Seq("k"), "inner", thr,
      leftRange = Some(("v", 0.0, 1.0)))
    assert(a1.leftBytesEst.exists(_ > thr.get),
      s"slice must size by whole intersecting bins (upper bound): $a1 vs thr=$thr whole=$whole")
    assert(a1.strategy !== "broadcast_left", a1.toString)
  }

  test("joinSnapshots: a range-sliced side READS manifest-pruned (r16 — poison the out-of-range files)") {
    import spark.implicits._
    val dim = java.nio.file.Files.createTempDirectory("graft_prs_dim").toString + "/t"
    val fact = java.nio.file.Files.createTempDirectory("graft_prs_fact").toString + "/t"
    // range-clustered fact: 8 files, each a contiguous v range
    val rows = (1 to 8000).map(i => (i.toLong % 50, i.toDouble)).toDF("k", "v")
    graft.store.Warehouse.writeSnapshot(
      rows.repartitionByRange(8, $"v"), fact)
    graft.store.Warehouse.writeSnapshot(
      (1 to 50).map(i => (i.toLong, s"n$i")).toDF("k", "name"), dim)
    val expected = graft.store.Warehouse.readSnapshot(spark, fact)
      .filter($"v" >= 0.0 && $"v" <= 900.0)
      .join(graft.store.Warehouse.readSnapshot(spark, dim), Seq("k"))
      .count()
    val sliced = graft.store.Warehouse.joinSnapshots(spark, fact, dim, Seq("k"),
      leftRange = Some(("v", 0.0, 900.0)))
    val allFiles = graft.store.Warehouse.readSnapshot(spark, fact).inputFiles.toSet
    val opened = sliced.inputFiles.toSet.intersect(allFiles)
    assert(opened.size < allFiles.size,
      s"a ~11% slice of a range-clustered table must skip files: ${opened.size}/${allFiles.size}")
    // poison every out-of-range fact file: the sliced join must still
    // answer — the scan opens only in-range files, not the table
    (allFiles -- opened).foreach { f =>
      val out = new java.io.FileOutputStream(new java.io.File(new java.net.URI(f)))
      out.write("not parquet".getBytes); out.close()
    }
    assert(graft.store.Warehouse.joinSnapshots(spark, fact, dim, Seq("k"),
      leftRange = Some(("v", 0.0, 900.0))).count() === expected)
  }

  test("joinAdvice: NESTED var-width columns refuse the width-only broadcast guess (r15)") {
    import spark.implicits._
    val nested = java.nio.file.Files.createTempDirectory("graft_vw_nested").toString + "/t"
    val fact = java.nio.file.Files.createTempDirectory("graft_vw_fact").toString + "/t"
    // a struct WRAPPING a string: the r14 guard looked only at
    // top-level types and would have broadcast this on the row-width
    // guess once the manifest's byte count is unreadable
    graft.store.Warehouse.writeSnapshot(
      (1 to 10).map(i => (i.toLong, (s"x$i" * 200, i))).toDF("k", "payload"), nested)
    graft.store.Warehouse.writeSnapshot(
      (1 to 5000).map(i => (i.toLong % 10, i.toLong)).toDF("k", "v"), fact)
    // strip the byte count from the manifest: the width-only path
    val mf = new java.io.File(nested, "_manifest-v1")
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = om.readTree(mf).asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    node.remove("bytes")
    om.writeValue(mf, node)
    val a = graft.store.Warehouse.joinAdvice(spark, nested, fact, Seq("k"),
      broadcastThreshold = Some(64L * 1024))
    assert(a.leftBytesEst.isEmpty,
      s"a nested string under a width-only guess must refuse to estimate: $a")
    assert(a.strategy === "shuffle", a.toString)
  }
}
