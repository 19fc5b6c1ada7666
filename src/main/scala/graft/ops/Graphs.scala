package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph analytics over derived item graphs (X212) — the second
  * member of the graph family next to X52's connected components.
  * The pipeline shape: a co-occurrence EDGE BUILD (items sharing a
  * group — parts in an order, tokens in a window, docs in a cluster)
  * followed by structure queries over the edge list. Everything is
  * edge-grain DataFrames: no adjacency materialization, no driver
  * graph, so the ops scale exactly as far as their joins shuffle.
  */
object Graphs {

  /** Distinct undirected co-occurrence edges `(a < b)` of items
    * sharing a group — the standard market-basket / co-citation edge
    * build. Per group of size k the pair stage emits k·(k−1)/2 rows,
    * so Σk² is the true cost: `maxGroupSize` caps it (groups above
    * the cap are DROPPED, the stopword move every co-occurrence
    * miner makes — a group shared by everything carries no signal
    * and quadratic cost). At 100 TB: the self-join co-partitions on
    * the group key (one shuffle of the deduped membership), the cap
    * bounds the blow-up, and `distinct` collapses multiplicity at
    * edge grain.
    */
  def coOccurrenceEdges(df: DataFrame, groupCol: String, itemCol: String,
                        maxGroupSize: Int = 50): DataFrame = {
    require(maxGroupSize >= 2, s"maxGroupSize must be >= 2, got $maxGroupSize")
    val itemType = df.schema(itemCol).dataType
    itemType match {
      case org.apache.spark.sql.types.LongType | org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType | org.apache.spark.sql.types.ByteType =>
        // Integral fast path (2 shuffles, no join, r12 — A/B at sf0.1:
        // edge build 1.03 s → 0.42 s warm): group membership collapses
        // into ONE hash aggregate whose `boundedDistinctLong` buffer is
        // capped at maxGroupSize entries — an oversized (stopword)
        // group costs O(cap) memory per partial and evaluates to NULL
        // (dropped), where `collect_set` + size filter would
        // materialize its whole membership first. Pairs are generated
        // in-task from the sorted per-group array (`longPairs`, the
        // posting-pairs move), so the only shuffles are the groupBy
        // and the final edge-grain distinct. Casting a ≤64-bit
        // integral through long is order- and value-preserving.
        df.select(col(groupCol).as("g"),
            col(itemCol).cast("long").as("i"))
          .groupBy("g")
          .agg(graft.functions.native.boundedDistinctLong(col("i"), maxGroupSize).as("items"))
          .filter(col("items").isNotNull)
          .select(explode(graft.functions.native.longPairs(col("items"))).as("p"))
          .select(col("p.a").cast(itemType).as("a"), col("p.b").cast(itemType).as("b"))
          .distinct()
      case _ =>
        // Generic item types: the windowed-count + self-join form.
        // Same semantics (distinct membership, groups above the cap
        // dropped, a < b in the item type's ordering), one more
        // shuffle + the join.
        val m = df.select(col(groupCol).as("g"), col(itemCol).as("i")).distinct()
          .withColumn("__gs", count(lit(1)).over(Window.partitionBy(col("g"))))
          .filter(col("__gs") <= maxGroupSize)
          .select("g", "i")
        m.as("x").join(m.as("y"), col("x.g") === col("y.g") && col("x.i") < col("y.i"))
          .select(col("x.i").as("a"), col("y.i").as("b"))
          .distinct()
    }
  }

  /** Weighted co-occurrence edges (X218): per canonical pair (a < b)
    * the number of kept groups containing BOTH endpoints plus the
    * association scores every real co-occurrence miner consumes —
    * `lift = P(a,b) / (P(a)·P(b))` and normalized PMI
    * `npmi = ln(lift) / ln(N / n_pair)` (1.0 at perfect
    * co-occurrence, 0 at independence, negative when anti-associated).
    * Same group-cap stopword rule as [[coOccurrenceEdges]]; all
    * probabilities are over KEPT groups. The plan is the bare-edge
    * build's plus one more aggregate: group sets (one capped hash
    * agg), then item frequencies (explode + agg) and pair frequencies
    * (in-task pair gen + agg) — the group-set frame feeds 3 consumers,
    * so it takes the [[matEdges]] boundary. Scores are one double
    * division and two `ln`s over integer counts; npmi is rounded to
    * 6 dp (two libm logs — the one place bit-exactness across engines
    * isn't guaranteed), lift left raw (single IEEE division).
    */
  def weightedCoOccurrenceEdges(df: DataFrame, groupCol: String, itemCol: String,
                                maxGroupSize: Int = 50): DataFrame = {
    require(maxGroupSize >= 2, s"maxGroupSize must be >= 2, got $maxGroupSize")
    val itemType = df.schema(itemCol).dataType
    val (nGroups, itemCnt, pairCnt) = itemType match {
      case org.apache.spark.sql.types.LongType | org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType | org.apache.spark.sql.types.ByteType =>
        val sets = df.select(col(groupCol).as("g"), col(itemCol).cast("long").as("i"))
          .groupBy("g")
          .agg(graft.functions.native.boundedDistinctLong(col("i"), maxGroupSize).as("items"))
          .filter(col("items").isNotNull)
          .localCheckpoint(true)
        (sets.agg(count(lit(1)).as("n_groups")),
          sets.select(explode(col("items")).as("i")).groupBy("i")
            .agg(count(lit(1)).as("n_i")),
          sets.select(explode(graft.functions.native.longPairs(col("items"))).as("p"))
            .groupBy(col("p.a").as("a"), col("p.b").as("b"))
            .agg(count(lit(1)).as("n_pair")))
      case _ =>
        val m = df.select(col(groupCol).as("g"), col(itemCol).as("i")).distinct()
          .withColumn("__gs", count(lit(1)).over(Window.partitionBy(col("g"))))
          .filter(col("__gs") <= maxGroupSize)
          .select("g", "i")
          .localCheckpoint(true)
        (m.agg(count_distinct(col("g")).as("n_groups")),
          m.groupBy("i").agg(count(lit(1)).as("n_i")),
          m.as("x").join(m.as("y"), col("x.g") === col("y.g") && col("x.i") < col("y.i"))
            .groupBy(col("x.i").as("a"), col("y.i").as("b"))
            .agg(count(lit(1)).as("n_pair")))
    }
    pairCnt
      .join(itemCnt.withColumnsRenamed(Map("i" -> "a", "n_i" -> "n_a")), "a")
      .join(itemCnt.withColumnsRenamed(Map("i" -> "b", "n_i" -> "n_b")), "b")
      .crossJoin(nGroups) // 1-row aggregate -> broadcast
      .withColumn("lift",
        col("n_pair").cast("double") * col("n_groups") /
          (col("n_a").cast("double") * col("n_b")))
      .withColumn("npmi",
        when(col("n_pair") === col("n_groups"), lit(1.0))
          .otherwise(round(
            log(col("lift")) /
              log(col("n_groups").cast("double") / col("n_pair")), 6)))
      .select(col("a").cast(itemType).as("a"), col("b").cast(itemType).as("b"),
        col("n_pair"), col("n_a"), col("n_b"), col("lift"), col("npmi"))
  }

  /** Bounded-iteration PageRank (X219) over an edge list — the
    * lineage-truncation discipline of the connected-components loop
    * applied to the other classic iterative graph op. Edge-grain
    * DataFrames throughout: per iteration one join of ranks onto the
    * (checkpointed) directed edges, one per-destination aggregate,
    * and a checkpoint of the new rank frame so the plan stays
    * iteration-sized instead of k-deep.
    *
    * Numeric contract (what makes q_graph_pagerank oracle-able): the
    * per-destination in-sum is a PLAIN distributed sum — partial-agg
    * order is engine- (and run-) dependent, so raw doubles carry
    * ~1-ULP noise; callers that need a cross-engine pin round to 9 dp
    * on both sides (ranks sit at 1e-2..1e-5 against an abs noise
    * floor of ~1e-18 — 9 dp keeps ~5 significant digits and makes a
    * bucket straddle ~1e-9-improbable per row). The ordered-cumsum
    * replay discipline (q_seasonal) was A/B'd and REJECTED here: it
    * still differed by 1 ULP from DuckDB's windowed sum (which is not
    * strictly streaming) while costing a per-iteration sort shuffle —
    * 3.2 s vs 1.x s at sf0.1 for nothing.
    *
    * Dangling mass (nodes with no out-edges) is redistributed
    * uniformly each iteration; for undirected input every node sends
    * on each incident edge, so the dangling branch (an anti-join +
    * scalar aggregate per iteration) is skipped entirely.
    */
  /** PERSONALIZED PageRank (X236) — the recommendation/similarity
    * primitive over the same edge-grain machinery as [[pageRank]]:
    * the walk teleports to the SEED set instead of uniformly, so the
    * stationary mass measures proximity TO THE SEEDS ("items
    * co-bought with these", "accounts near this cluster"). Rule per
    * iteration: rank = [node ∈ S]·(1−d)/|S| + d·in_sum (undirected
    * input has no dangling branch, the [[pageRank]] argument); ranks
    * start 1/|S| on seeds, 0 elsewhere. |S| counts the seeds that
    * EXIST as graph nodes (one bounded driver count); an empty
    * intersection refuses loudly. `weightCol` (r13) threads edge
    * weights exactly as [[pageRank]] does: a w-weighted edge carries
    * w/strength(src) of its source's rank — seeded recommendation
    * over NPMI/support edges.
    *
    * The undirected walk is FRONTIER-BASED (r13 rework of the r12
    * perf-weak mark): the rank frame holds only REACHED nodes (seeds,
    * then their distance-≤i neighborhood) instead of every node —
    * unreached nodes hold rank 0 and contribute nothing, so carrying
    * them through every join was pure waste; a 100 TB graph probed
    * with a 3-hop seed query now iterates on neighborhood-sized
    * state, not graph-sized. Each round: frontier⋈edges + aggregate,
    * then a union with the (bounded, materialized-once) seed teleport
    * rows and a re-aggregate — every node gets ≤ 2 rows whose
    * two-operand IEEE add is order-exact, preserving the 9-dp oracle
    * contract. Unreached nodes are zero-filled ONCE at the end
    * against the node frame. A/B at sf0.1 (bench key q_graph_ppr,
    * min-of-8): r12 all-nodes form 3.49 s → 2.10 s. Directed input
    * keeps the all-nodes form: dangling mass and sink-node teleport
    * need the full frame each round.
    */
  def personalizedPageRank(edges: DataFrame, seeds: DataFrame,
                           iterations: Int = 3, damping: Double = 0.85,
                           undirected: Boolean = true,
                           weightCol: Option[String] = None): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val w = weightCol.map(col).getOrElse(lit(1L))
    val dir0 =
      if (undirected)
        edges.select(col("a").as("src"), col("b").as("dst"), w.as("w"))
          .unionAll(edges.select(col("b").as("src"), col("a").as("dst"), w.as("w")))
      else edges.select(col("a").as("src"), col("b").as("dst"), w.as("w"))
    val outdeg = dir0.groupBy(col("src").as("odn")).agg(sum(col("w")).as("outdeg"))
    val dirEdges = dir0.join(outdeg, col("src") === col("odn")).drop("odn")
      .localCheckpoint(true)
    val seedIn = broadcast(
      seeds.select(seeds.columns.head).toDF("__seed").distinct())
    if (undirected) {
      // undirected: every node appears as src, so src alone spans the
      // node set. Materialize seeds∩nodes ONCE — it is consumed every
      // iteration, and the caller's seed plan may share an expensive
      // subtree with the edge plan that must not recompute per use.
      val seedNodes = dirEdges.select(col("src").as("__seed")).distinct()
        .join(seedIn, Seq("__seed"), "left_semi")
        .localCheckpoint(true)
      val nS = seedNodes.count().toDouble
      require(nS > 0,
        "personalizedPageRank: no seed is a node of the graph — nothing to walk toward")
      val teleport = (1.0 - damping) / nS
      val seedB = broadcast(seedNodes)
      // teleport rows FUSED into the round's one aggregate (r14 — the
      // r13 verdict's remaining PPR lever): the old shape aggregated
      // in-sums at dst grain, unioned the seed teleport rows, then
      // RE-aggregated at node grain — a second shuffle + stage barrier
      // per round for a |S|-row addition. Instead the seed rows enter
      // the SAME groupBy as (term=0, tel=teleport) alongside the edge
      // contributions (term=rank·w/outdeg, tel=0): one edge-grain
      // aggregate per round, no node-grain re-shuffle. Numerically
      // identical: summing the seeds' 0.0 terms is IEEE-exact
      // (x+0.0=x), max(tel) picks the one teleport constant, and
      // `damping·in_sum + tel` is the same two-operand add the union
      // form produced — the 9-dp oracle contract is untouched
      // (hash-green re-verified at all three SFs). A/B isolated
      // min-of-3 at sf0.1: 1.87 s → 1.36 s.
      var ranks = seedB.select(col("__seed").as("node"), lit(1.0 / nS).as("rank"))
      for (i <- 1 to iterations) {
        ranks = checkpointCadence(
          undirectedPprRound(ranks, dirEdges, seedB, teleport, damping),
          i, iterations)
      }
      dirEdges.select(col("src").as("node")).distinct()
        .join(ranks, Seq("node"), "left")
        .select(col("node"), coalesce(col("rank"), lit(0.0)).as("rank"))
    } else {
      val nodes = dirEdges.select(col("src").as("node"))
        .unionAll(dirEdges.select(col("dst").as("node")))
        .distinct()
        .join(seedIn, col("node") === col("__seed"), "left")
        .select(col("node"), col("__seed").isNotNull.as("is_seed"))
        .localCheckpoint(true)
      val nS = nodes.filter(col("is_seed")).count().toDouble
      require(nS > 0,
        "personalizedPageRank: no seed is a node of the graph — nothing to walk toward")
      val teleport = (1.0 - damping) / nS
      var ranks: DataFrame = nodes.select(col("node"),
        when(col("is_seed"), lit(1.0 / nS)).otherwise(lit(0.0)).as("rank"))
      for (i <- 1 to iterations) {
        val inSums = ranks.join(dirEdges, col("node") === col("src"))
          .groupBy(col("dst"))
          .agg(sum(col("rank") * col("w") / col("outdeg")).as("in_sum"))
        val dangling = ranks
          .join(dirEdges.select(col("src")).distinct(), col("node") === col("src"), "left_anti")
          .agg(coalesce(sum(col("rank")), lit(0.0)).as("dm"))
        val next = nodes.join(inSums, col("node") === col("dst"), "left")
          .crossJoin(dangling) // 1-row aggregate -> broadcast
          .select(col("node"),
            (when(col("is_seed"), lit(teleport)).otherwise(lit(0.0)) +
              lit(damping) * (coalesce(col("in_sum"), lit(0.0)) +
                when(col("is_seed"), col("dm") / lit(nS)).otherwise(lit(0.0))))
              .as("rank"))
        ranks = checkpointCadence(next, i, iterations)
      }
      ranks.select(col("node"), col("rank"))
    }
  }

  /** One fused undirected-PPR round (r14): edge contributions and the
    * seed teleport rows enter the SAME groupBy, so each round is ONE
    * edge-grain aggregate — see the doc at the call site in
    * [[personalizedPageRank]] for the numeric-identity argument.
    */
  private def undirectedPprRound(ranks: DataFrame, dirEdges: DataFrame,
                                 seedB: DataFrame, teleport: Double,
                                 damping: Double): DataFrame =
    ranks.join(dirEdges, col("node") === col("src"))
      .select(col("dst"), (col("rank") * col("w") / col("outdeg")).as("term"),
        lit(0.0).as("tel"))
      .unionAll(seedB.select(col("__seed").as("dst"), lit(0.0).as("term"),
        lit(teleport).as("tel")))
      .groupBy(col("dst"))
      .agg(sum(col("term")).as("in_sum"), max(col("tel")).as("tel"))
      .select(col("dst").as("node"),
        (lit(damping) * col("in_sum") + col("tel")).as("rank"))

  /** WARM-START PPR REFRESH after edge churn (X245, r14) — the graph ×
    * IVM composition's walk half: given ranks computed on the OLD edge
    * list, run `rounds` PPR rounds on the NEW edge list starting FROM
    * the stored ranks instead of from the seeds, then zero-fill
    * against the new node set. The PPR round `x ← d·Pᵀx + t` is an
    * L1-contraction with factor `d` (P is the walk's column-stochastic
    * transition), so after j refresh rounds the L1 distance to the
    * NEW graph's stationary ranks is ≤ dʲ · ‖R_old − R*_new‖₁ ≤ 2·dʲ
    * (both vectors carry ≈ unit mass) — and in practice far smaller,
    * because an edge bracket touching few nodes leaves R_old ≈ R*_new
    * away from the changed region, so the same j lands much closer
    * than a cold start's dʲ·‖t − R*‖₁ would (spec-pinned both ways on
    * a hand graph). A correction walk SEEDED at the changed endpoints
    * was considered and rejected: PPR is linear in the TELEPORT
    * vector, but an edge change perturbs the OPERATOR — a C-seeded
    * walk has no exactness guarantee to offer, while the warm start's
    * contraction bound is unconditional. State stays
    * reached-neighborhood-sized (the stored ranks are already
    * frontier-shaped); each round is the same fused single aggregate
    * as the cold walk. Undirected edges only, like the frontier walk.
    */
  def refreshPersonalizedPageRank(edges: DataFrame, seeds: DataFrame,
                                  storedRanks: DataFrame, rounds: Int = 2,
                                  damping: Double = 0.85,
                                  weightCol: Option[String] = None): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val w = weightCol.map(col).getOrElse(lit(1L))
    val dir0 = edges.select(col("a").as("src"), col("b").as("dst"), w.as("w"))
      .unionAll(edges.select(col("b").as("src"), col("a").as("dst"), w.as("w")))
    val outdeg = dir0.groupBy(col("src").as("odn")).agg(sum(col("w")).as("outdeg"))
    val dirEdges = dir0.join(outdeg, col("src") === col("odn")).drop("odn")
      .localCheckpoint(true)
    val seedIn = broadcast(
      seeds.select(seeds.columns.head).toDF("__seed").distinct())
    val seedNodes = dirEdges.select(col("src").as("__seed")).distinct()
      .join(seedIn, Seq("__seed"), "left_semi")
      .localCheckpoint(true)
    val nS = seedNodes.count().toDouble
    require(nS > 0,
      "refreshPersonalizedPageRank: no seed is a node of the graph")
    val teleport = (1.0 - damping) / nS
    val seedB = broadcast(seedNodes)
    // stale mass on nodes no longer in the graph would leak into the
    // first round through the edge join only if they still have edges
    // — nodes deleted entirely just drop (their rank rows match no
    // src). Nodes that exist but were unreached read as 0, exactly the
    // frontier convention.
    var ranks = storedRanks.select(col("node"), col("rank").cast("double").as("rank"))
    for (i <- 1 to rounds) {
      ranks = checkpointCadence(
        undirectedPprRound(ranks, dirEdges, seedB, teleport, damping), i, rounds)
    }
    dirEdges.select(col("src").as("node")).distinct()
      .join(ranks, Seq("node"), "left")
      .select(col("node"), coalesce(col("rank"), lit(0.0)).as("rank"))
  }

  def pageRank(edges: DataFrame, iterations: Int = 3, damping: Double = 0.85,
               undirected: Boolean = true, weightCol: Option[String] = None): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    // weighted walk (X218 composition): an edge with weight w receives
    // w/strength(src) of its source's rank instead of 1/outdeg — the
    // natural random walk over a weighted co-occurrence graph (feed
    // n_pair from weightedCoOccurrenceEdges). Integer weights keep the
    // oracle recomposition exact under the same 9-dp contract: the
    // per-edge share is ONE division of a double rank by an integer
    // ratio... (rank * w) / strength — two IEEE ops, engine-identical.
    val w = weightCol.map(col).getOrElse(lit(1L))
    val dir0 =
      if (undirected)
        edges.select(col("a").as("src"), col("b").as("dst"), w.as("w"))
          .unionAll(edges.select(col("b").as("src"), col("a").as("dst"), w.as("w")))
      else edges.select(col("a").as("src"), col("b").as("dst"), w.as("w"))
    val outdeg = dir0.groupBy(col("src").as("odn")).agg(sum(col("w")).as("outdeg"))
    // outdeg (the source's total out-weight) is per-source static: join
    // it into the edge frame ONCE, not per iteration, and checkpoint —
    // the per-iteration plan is then join + aggregate, nothing else.
    // Pre-hashing this frame on src was A/B'd and REJECTED (r13): the
    // whole walk runs as ONE job, and ReuseExchange dedupes the edge
    // frame's identical per-iteration shuffle within it, so the edge
    // side already moves exactly once; an explicit repartition only
    // pins 32 un-coalesced partitions against AQE (measured min-of-3
    // from a pre-built edge frame at sf0.1: 1.01 s plain vs 1.64 s
    // pre-hashed).
    val dirEdges = dir0.join(outdeg, col("src") === col("odn")).drop("odn")
      .localCheckpoint(true)
    // undirected: src alone spans the node set, and the frame is
    // consumed exactly twice (the count job + the init projection in
    // the final job) — both cheap re-derivations from the checkpointed
    // edge frame, so a third checkpoint job buys nothing. Directed
    // input references it every iteration → materialize.
    val nodes0 =
      if (undirected) dirEdges.select(col("src").as("node")).distinct()
      else dirEdges.select(col("src").as("node"))
        .unionAll(dirEdges.select(col("dst").as("node"))).distinct()
    val nodes = if (undirected) nodes0 else nodes0.localCheckpoint(true)
    // one driver-side long: the node count seeds 1/N and the teleport
    // term (bounded by design — a scalar, not a collect of rows)
    val n = nodes.count().toDouble
    val teleport = (1.0 - damping) / n
    // iteration 1 from the uniform vector is JOIN-FREE on undirected
    // input: every rank is the constant 1/n, so the in-sum is one
    // aggregate over the edge frame with the constant inlined — same
    // per-term IEEE arithmetic, one less edge-grain join per walk
    val (first, rest) =
      if (undirected) {
        val r1 = dirEdges.groupBy(col("dst"))
          .agg(sum(lit(1.0 / n) * col("w") / col("outdeg")).as("in_sum"))
          .select(col("dst").as("node"),
            (lit(teleport) + lit(damping) * col("in_sum")).as("rank"))
        (checkpointCadence(r1, 1, iterations), 2 to iterations)
      } else (nodes.select(col("node"), lit(1.0 / n).as("rank")), 1 to iterations)
    var ranks = first
    for (i <- rest) {
      val inSums = ranks.join(dirEdges, col("node") === col("src"))
        .groupBy(col("dst"))
        .agg(sum(col("rank") * col("w") / col("outdeg")).as("in_sum"))
      // undirected: inSums covers every node (see personalizedPageRank)
      // — no node-frame join needed at all
      val next =
        if (undirected)
          inSums.select(col("dst").as("node"),
            (lit(teleport) + lit(damping) * col("in_sum")).as("rank"))
        else {
          val base = nodes.join(inSums, col("node") === col("dst"), "left")
          val dangling = ranks
            .join(dirEdges.select(col("src")).distinct(), col("node") === col("src"), "left_anti")
            .agg(coalesce(sum(col("rank")), lit(0.0)).as("dm"))
          base.crossJoin(dangling) // 1-row aggregate -> broadcast
            .select(col("node"),
              (lit(teleport) + lit(damping) *
                (coalesce(col("in_sum"), lit(0.0)) + col("dm") / lit(n))).as("rank"))
        }
      ranks = checkpointCadence(next, i, iterations)
    }
    ranks
  }

  /** PageRank TO CONVERGENCE with early exit (r13) — the X238
    * fixpoint discipline applied to the walk: iterate [[pageRank]]'s
    * round until the L1 rank delta falls under `tol`, bounded by
    * `maxIterations` with a loud refusal when hit un-converged (a
    * silently-unconverged ranking is a wrong answer, not a slow one).
    * The delta is one driver-side double per round, read off the
    * round's own materialized frame by carrying the previous rank
    * through the round's join (the minLabelPropagateFixpoint move) —
    * no second pass. Unlike the bounded form, every round
    * materializes (the delta forces a job), so this is the form for
    * callers that need the STATIONARY ranking; when k iterations are
    * known to suffice, [[pageRank]]'s cadence form is cheaper. On a
    * low-diameter graph (d=0.85) the L1 delta contracts by ~d per
    * round, so 1e-6 lands in ~80 rounds worst-case and far fewer on
    * real co-occurrence graphs.
    */
  def pageRankConverged(edges: DataFrame, tol: Double = 1e-6,
                        maxIterations: Int = 100, damping: Double = 0.85,
                        undirected: Boolean = true,
                        weightCol: Option[String] = None): DataFrame = {
    require(tol > 0, s"tol must be positive, got $tol")
    require(maxIterations >= 1, s"maxIterations must be >= 1, got $maxIterations")
    val w = weightCol.map(col).getOrElse(lit(1L))
    val dir0 =
      if (undirected)
        edges.select(col("a").as("src"), col("b").as("dst"), w.as("w"))
          .unionAll(edges.select(col("b").as("src"), col("a").as("dst"), w.as("w")))
      else edges.select(col("a").as("src"), col("b").as("dst"), w.as("w"))
    val outdeg = dir0.groupBy(col("src").as("odn")).agg(sum(col("w")).as("outdeg"))
    val dirEdges = dir0.join(outdeg, col("src") === col("odn")).drop("odn")
      .localCheckpoint(true)
    val nodes0 =
      if (undirected) dirEdges.select(col("src").as("node")).distinct()
      else dirEdges.select(col("src").as("node"))
        .unionAll(dirEdges.select(col("dst").as("node"))).distinct()
    val nodes = if (undirected) nodes0 else nodes0.localCheckpoint(true)
    val n = nodes.count().toDouble
    val teleport = (1.0 - damping) / n
    var ranks = nodes.select(col("node"), lit(1.0 / n).as("rank"))
      .localCheckpoint(true)
    var iter = 0
    var delta = Double.MaxValue
    while (delta > tol && iter < maxIterations) {
      val inSums = ranks.join(dirEdges, col("node") === col("src"))
        .groupBy(col("dst"))
        .agg(sum(col("rank") * col("w") / col("outdeg")).as("in_sum"))
      val next0 =
        if (undirected)
          inSums.select(col("dst").as("node"),
            (lit(teleport) + lit(damping) * col("in_sum")).as("rank"))
        else {
          val dangling = ranks
            .join(dirEdges.select(col("src")).distinct(), col("node") === col("src"), "left_anti")
            .agg(coalesce(sum(col("rank")), lit(0.0)).as("dm"))
          nodes.join(inSums, col("node") === col("dst"), "left")
            .crossJoin(dangling)
            .select(col("node"),
              (lit(teleport) + lit(damping) *
                (coalesce(col("in_sum"), lit(0.0)) + col("dm") / lit(n))).as("rank"))
        }
      val next = next0
        .join(ranks.withColumnRenamed("rank", "__prev"), Seq("node"))
        .localCheckpoint(true)
      delta = next.agg(sum(abs(col("rank") - col("__prev")))).head().getDouble(0)
      ranks = next.drop("__prev")
      iter += 1
    }
    require(delta <= tol,
      s"pageRankConverged: L1 delta $delta > tol $tol after $maxIterations rounds — " +
        "raise maxIterations or loosen tol")
    ranks
  }

  /** Lineage-truncation cadence for the iterative rank loops (r13 —
    * the r12 perf-weak fix). Eager `localCheckpoint(true)` EVERY
    * iteration costs ~3 extra jobs + executor-local block writes per
    * iteration and a scheduling barrier each — but buys nothing at
    * bounded iteration counts, because the un-truncated walk runs as
    * ONE job whose shuffle boundaries already materialize every round
    * exactly once (ReuseExchange dedupes the static edge frame's
    * identical per-iteration exchange, and each round's aggregate
    * output is a shuffle the next round reads — nothing is ever
    * recomputed). What checkpointing actually bounds is PLAN size
    * (analyzer/optimizer cost grows with join depth), so truncate on a
    * cadence: every 4th iteration, never on the final one (its only
    * consumer is the single output action). A/B at sf0.1 from a
    * pre-built edge frame (min-of-3, warm JVM, 3 iterations):
    * every-iteration eager 4.90 s → cadence-2 1.36 s → zero
    * checkpoints (this policy at k=3) 1.01 s; full-query bench keys
    * (min-of-8 subset run, with the join-free first iteration and the
    * PPR frontier rework) q_graph_pagerank 3.16 → 1.78 s, q_graph_ppr
    * 3.49 → 2.10 s, q_graph_pagerank_weighted 2.69 → 1.76 s; the
    * committed full-suite record (r13, min-of-3 passes + isolated
    * min-of-3 on the fresh JVM) carries in-suite 2.05/2.42/2.06 and
    * ISOLATED q_graph_pagerank 1.15 s / q_graph_ppr 1.98 s — the
    * honest clean-JVM numbers; oracles unchanged, hash-green.
    * DECOMPOSITION (r14, WalkFloorProbe at sf0.1, min-of-3 warm):
    * scan+filter 0.13 s, edge build 0.52 s, walk from pre-built edges
    * 0.70 s, FULL query 1.047 s (< the sum — ReuseExchange shares the
    * edge distinct inside the one job) with per-run times 2.00 → 1.33
    * → 1.05 still descending at run 3 — so the residual the r12 bar
    * chased (isolated 1.71 s vs ≤ 1.5) is fresh-JVM codegen/JIT
    * warmup, not plan cost; the bench's isolated block now takes
    * min-of-5 to measure past it. At 100×: per-iteration work is
    * edge-linear and the every-4th checkpoint is node-linear — the
    * cadence cuts the materialization constant 4× and removes the
    * per-iteration barrier; nothing about the plan shape changes.
    */
  private def checkpointCadence(next: DataFrame, i: Int, iterations: Int): DataFrame =
    if (i != iterations && i % 4 == 0) next.localCheckpoint(true)
    else next

  /** Exact triangle count of an undirected graph given as canonical
    * `(a < b)` distinct edges — the classic wedge-close join: a
    * wedge `a→b→c` (IDs ascending) closes iff `(a, c)` is an edge.
    * ID orientation bounds each node's forward fan-out to its
    * higher-ID neighbors; on a skewed degree distribution the
    * standard upgrade is DEGREE orientation (forward = toward the
    * higher-degree endpoint), which provably minimizes Σ outdeg² —
    * same count, smaller wedge stage; ID orientation keeps the
    * cross-engine recomposition trivial and is the right default at
    * the co-occurrence cap's bounded degrees. Input edges are
    * assumed canonical and distinct (what [[coOccurrenceEdges]]
    * emits); duplicates would overcount.
    */
  def triangleCount(edges: DataFrame): DataFrame =
    edges.as("e1")
      .join(edges.as("e2"), col("e1.b") === col("e2.a"))
      .join(edges.as("e3"),
        col("e1.a") === col("e3.a") && col("e2.b") === col("e3.b"))
      .agg(count(lit(1)).as("n_triangles"))

  /** Materialization boundary for the multi-consumer graph ops.
    *
    * [[neighborhoodJaccard]] references its edge frame 4× (degrees
    * twice via the union, the wedge self-join twice via `adj`) and
    * [[graphSummary]] 6× — and the edge frame handed in is typically
    * [[coOccurrenceEdges]]'s window + self-join + distinct, the
    * costliest subtree in the pipeline. Un-materialized, Spark
    * re-evaluates that subtree per consumer (exchange reuse only
    * fires on byte-identical plan fragments, which the differing
    * projections defeat). This is `Mat`'s documented "kernel-heavy
    * multi-consumer" exception: the subtree's INPUT bytes are small
    * (one lineitem scan) but its recompute cost is a shuffle + pair
    * blow-up, so the size gate would never fire — checkpoint
    * unconditionally, as `nearDupClusters` does. Measured at sf0.1
    * (isolated min-of-3, with the r12 edge-build + wedge-join work):
    * q_graph_jaccard 2.40 s → 1.34 s, q_graph_triangles 1.31 s →
    * 0.85 s. Cluster swap: persist (DISK_ONLY) or a stage table for
    * corpus-sized edge lists.
    */
  private def matEdges(edges: DataFrame): DataFrame =
    edges.localCheckpoint(true)

  /** Common-neighbor counts for node pairs at distance 2 — the wedge
    * aggregate under [[triangleCount]], surfaced: pair `(a < b)` with
    * the number of shared neighbors, whether or not (a, b) is itself
    * an edge. The raw signal of neighborhood-overlap link prediction
    * and graph-side entity resolution. Same Σdeg² wedge cost and the
    * same bound: cap degrees at the edge build.
    */
  def commonNeighbors(edges: DataFrame): DataFrame = {
    val adj = edges.select(col("a").as("u"), col("b").as("v"))
      .unionAll(edges.select(col("b").as("u"), col("a").as("v")))
    // SHUFFLE_HASH: the wedge joins are many-to-many on bounded-degree
    // keys — a per-partition hash build of the adjacency is bounded by
    // the same degree cap that bounds the wedge output itself, and
    // skipping both sort passes is worth ~2× on the wedge stage
    // (A/B at sf0.1 warm: 1.18 s SMJ → 0.67 s shuffled-hash). SMJ's
    // spill safety buys nothing here: a partition too big to hash is a
    // wedge stage too big to enumerate. triangleCount stays UNhinted
    // by contrast — its edge frame is small enough that the planner
    // broadcasts it, and forcing SHUFFLE_HASH there measured 0.85 →
    // 1.24 s worse.
    adj.as("x").join(adj.as("y").hint("SHUFFLE_HASH"),
        col("x.v") === col("y.v") && col("x.u") < col("y.u"))
      .groupBy(col("x.u").as("a"), col("y.u").as("b"))
      .agg(count(lit(1)).as("common"))
  }

  /** Adamic–Adar link prediction over distance-2 pairs (X242, r13):
    * `aa(a, b) = Σ_{z ∈ N(a)∩N(b)} 1 / ln(deg(z))` — the
    * inverse-log-degree weighting that makes a rare shared neighbor
    * count more than a hub (Adamic & Adar '03, "Friends and neighbors
    * on the Web"). Same wedge stage as [[commonNeighbors]] (Σ outdeg²
    * bounded by the edge build's degree cap, SHUFFLE_HASH for the same
    * measured reason) with the center's degree joined on before the
    * pair aggregate. A shared neighbor of two nodes has degree ≥ 2 by
    * construction, so ln(deg) > 0 and the division is total. One libm
    * log per wedge — the one cross-engine non-bit-exact term — so the
    * score is 6-dp rounded on both sides (the NPMI contract); `common`
    * rides along unrounded (integer count).
    */
  def adamicAdar(edges: DataFrame): DataFrame = {
    val e = matEdges(edges)
    val deg = degrees(e)
    val adj = e.select(col("a").as("u"), col("b").as("v"))
      .unionAll(e.select(col("b").as("u"), col("a").as("v")))
    val withDeg = adj.join(deg.withColumnsRenamed(Map("node" -> "v", "degree" -> "deg_v")), "v")
    withDeg.as("x").join(withDeg.as("y").hint("SHUFFLE_HASH"),
        col("x.v") === col("y.v") && col("x.u") < col("y.u"))
      .groupBy(col("x.u").as("a"), col("y.u").as("b"))
      .agg(count(lit(1)).as("common"),
        round(sum(lit(1.0) / log(col("x.deg_v").cast("double"))), 6).as("aa"))
  }

  /** Neighborhood Jaccard of distance-2 pairs: `common / (deg(a) +
    * deg(b) − common)` — the classic link-prediction score, exact and
    * engine-deterministic (integer counts, one IEEE division). Pairs
    * with zero common neighbors never appear (their score is 0 and
    * their enumeration would be all-pairs).
    */
  def neighborhoodJaccard(edges: DataFrame): DataFrame = {
    val e = matEdges(edges)
    val deg = degrees(e)
    commonNeighbors(e)
      .join(deg.withColumnsRenamed(Map("node" -> "a", "degree" -> "deg_a")), "a")
      .join(deg.withColumnsRenamed(Map("node" -> "b", "degree" -> "deg_b")), "b")
      .withColumn("jaccard",
        col("common") / (col("deg_a") + col("deg_b") - col("common")))
      .select("a", "b", "common", "deg_a", "deg_b", "jaccard")
  }

  /** Fixed-k min-label propagation over a canonical edge list (X222)
    * — the ORACLE-ELIGIBLE twin of the connected-components loop
    * (X52's `nearDupClusters`): the q_bpe_learn move, a fixed-k
    * unroll that makes the loop BODY ANSI-expressible so another
    * engine recomposes the exact join + min-aggregate every round
    * performs and hash-matches the labels. After k rounds each node
    * holds the minimum id within graph distance k — the converged
    * component min wherever k covers the component's radius from its
    * min node (spec-pinned both ways: equality with the converged
    * production loop on small-diameter graphs, strict distance-k
    * semantics on a path). Round 1 is the production loop's fused
    * form (label = min(own, neighbors) in one aggregate, no label
    * join); rounds 2..k replay its join + aggregate + least. The
    * production path stays [[graft.ext.Dedup.nearDupClusters]] — this
    * is the verification harness for its loop body, same per-round
    * plan shape, same lineage-truncation checkpoints.
    */
  def minLabelPropagate(edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val dir = edges.select(col("a").as("x"), col("b").as("y"))
      .unionAll(edges.select(col("b").as("x"), col("a").as("y")))
      .localCheckpoint(true) // consumed every round
    var labels = dir.groupBy("x").agg(min(col("y")).as("m"))
      .select(col("x").as("id"), least(col("x"), col("m")).as("cluster"))
      .localCheckpoint(true)
    for (_ <- 2 to rounds) {
      val neighborMin = dir
        .join(labels.select(col("id").as("y"), col("cluster").as("ycl")), Seq("y"))
        .groupBy("x").agg(min(col("ycl")).as("ncl"))
      labels = labels
        .join(neighborMin.select(col("x").as("id"), col("ncl")), Seq("id"), "left")
        .select(col("id"),
          least(col("cluster"), coalesce(col("ncl"), col("cluster"))).as("cluster"))
        .localCheckpoint(true)
    }
    labels
  }

  /** Min-label propagation TO FIXPOINT with early exit (r13): iterate
    * [[minLabelPropagate]]'s round until no label changes, bounded by
    * `maxRounds` (refuses loudly on hitting the bound un-converged —
    * a silent partial labeling is a wrong answer, not a slow one).
    * The convergence probe is one driver-side long per round (the
    * pageRank-teleport discipline): min-label propagation is MONOTONE
    * — labels only ever decrease — so the round's change count falls
    * out of the same frame by carrying the previous label through the
    * round's projection and counting `cluster < prev` rows on the
    * already-materialized checkpoint; no second join, no extra
    * shuffle. On a low-diameter graph (every real co-occurrence
    * cluster) this exits in O(diameter) rounds instead of a
    * caller-guessed k; each round is the exact join + min-aggregate
    * the bounded form unrolls, so the fixpoint equals
    * [[graft.ext.Dedup.nearDupClusters]]'s converged labels
    * (spec-pinned both ways in GraphsSpec).
    */
  def minLabelPropagateFixpoint(edges: DataFrame, maxRounds: Int = 50): DataFrame = {
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    val dir = edges.select(col("a").as("x"), col("b").as("y"))
      .unionAll(edges.select(col("b").as("x"), col("a").as("y")))
      .localCheckpoint(true) // consumed every round
    var labels = dir.groupBy("x").agg(min(col("y")).as("m"))
      .select(col("x").as("id"), least(col("x"), col("m")).as("cluster"))
      .localCheckpoint(true)
    // `round` counts COMPLETED probe rounds, starting at 0, so the
    // bound means what it says: up to maxRounds probe rounds run, and
    // maxRounds=1 performs exactly one (the r13 ADVICE off-by-one:
    // `round = 1` + `round < maxRounds` ran maxRounds−1 and made
    // maxRounds=1 refuse unconditionally, even on a converged graph) —
    // matching pageRankConverged's `iter < maxIterations` semantics.
    var round = 0
    var changed = 1L
    while (changed > 0L && round < maxRounds) {
      val neighborMin = dir
        .join(labels.select(col("id").as("y"), col("cluster").as("ycl")), Seq("y"))
        .groupBy("x").agg(min(col("ycl")).as("ncl"))
      val next = labels
        .join(neighborMin.select(col("x").as("id"), col("ncl")), Seq("id"), "left")
        .select(col("id"),
          least(col("cluster"), coalesce(col("ncl"), col("cluster"))).as("cluster"),
          col("cluster").as("__prev"))
        .localCheckpoint(true)
      changed = next.filter(col("cluster") < col("__prev")).count()
      labels = next.drop("__prev")
      round += 1
    }
    require(changed == 0L,
      s"minLabelPropagateFixpoint: not converged after $maxRounds rounds — raise maxRounds")
    labels
  }

  /** Degree of every node of a canonical undirected edge list. */
  def degrees(edges: DataFrame): DataFrame =
    edges.select(col("a").as("node"))
      .unionAll(edges.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))

  /** Exact triangle count under DEGREE orientation — the skew-proof
    * upgrade over [[triangleCount]]'s ID orientation. Each edge is
    * oriented toward its higher-(degree, id) endpoint, which provably
    * minimizes Σ outdeg² (every node's forward fan-out is bounded by
    * √(2·|E|) regardless of its true degree), so a power-law hub
    * costs O(|E|) wedges instead of O(deg²). Same count — a triangle
    * {x, y, z} has exactly one node with two outgoing oriented edges,
    * and the closing edge is oriented low→high in the same total
    * order, so each triangle is enumerated exactly once
    * (spec-pinned count-equal to the ID-oriented form). The price is
    * the orientation's two extra degree joins at the edge grain; ID
    * orientation stays the default because on a cap-bounded
    * co-occurrence graph degrees are near-homogeneous and the joins
    * cost more than the Σ outdeg² reduction saves — measured
    * (ScaleProbe graph section, 4× rotated-degree load): ID 1.17 s vs
    * degree-oriented 3.80 s on 470k edges. Reach for this form on
    * POWER-LAW graphs (follower/link graphs), where one hub's deg²
    * dominates everything.
    */
  def triangleCountDegreeOriented(edges: DataFrame): DataFrame =
    triangleCountDegreeOrientedOn(matEdges(edges))

  /** [[triangleCountDegreeOriented]] over an ALREADY-materialized edge
    * frame (3 references below: degrees' union + the orientation
    * join) — lets [[graphSummary]] share one boundary across its
    * consumers instead of checkpointing twice.
    */
  private def triangleCountDegreeOrientedOn(e: DataFrame): DataFrame = {
    val deg = degrees(e)
    // orient a→b iff (deg(a), a) < (deg(b), b); carry ord(dst) so the
    // wedge stage can order a node's two out-neighbors without
    // re-joining degrees
    val withDeg = e
      .join(deg.withColumnsRenamed(Map("node" -> "a", "degree" -> "deg_a")), "a")
      .join(deg.withColumnsRenamed(Map("node" -> "b", "degree" -> "deg_b")), "b")
    val aFirst = col("deg_a") < col("deg_b") ||
      (col("deg_a") === col("deg_b") && col("a") < col("b"))
    val fwd = withDeg.select(
        when(aFirst, col("a")).otherwise(col("b")).as("src"),
        when(aFirst, col("b")).otherwise(col("a")).as("dst"),
        when(aFirst, col("deg_b")).otherwise(col("deg_a")).as("dd"))
      .localCheckpoint(true) // 3 consumers below — same boundary as matEdges
    val e2AfterE1 = col("e1.dd") < col("e2.dd") ||
      (col("e1.dd") === col("e2.dd") && col("e1.dst") < col("e2.dst"))
    fwd.as("e1")
      .join(fwd.as("e2"), col("e1.src") === col("e2.src") && e2AfterE1)
      .join(fwd.as("e3"),
        col("e1.dst") === col("e3.src") && col("e2.dst") === col("e3.dst"))
      .agg(count(lit(1)).as("n_triangles"))
  }

  /** One-row structural summary: nodes, edges, triangles, max degree
    * — the graph-health probe a derived-graph pipeline logs per run.
    * `degreeOriented = true` swaps the wedge stage for
    * [[triangleCountDegreeOriented]] (same count, skew-proof cost).
    */
  def graphSummary(edges: DataFrame, degreeOriented: Boolean = false): DataFrame = {
    val e = matEdges(edges)
    val d = degrees(e)
    val nt = if (degreeOriented) triangleCountDegreeOrientedOn(e) else triangleCount(e)
    val nodesEdges = d.agg(count(lit(1)).as("n_nodes"), max(col("degree")).as("max_degree"))
      .crossJoin(e.agg(count(lit(1)).as("n_edges")))
    nodesEdges.crossJoin(nt)
      .select(col("n_nodes"), col("n_edges"), col("n_triangles"), col("max_degree"))
  }
}
