package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField}

/** Total-order operators that scale: global row index and global
  * running sum under an explicit sort order, computed WITHOUT the
  * naive `row_number() OVER (ORDER BY …)` — which Spark plans as a
  * single-partition window, the canonical 100 TB scale-killer.
  *
  * Shape (the textbook two-pass used by RDD.zipWithIndex): range-
  * partition on the sort key so partition p holds keys below partition
  * p+1, sort within partitions, run one tiny job to collect per-
  * partition counts/sums (one row per partition), broadcast the
  * cumulative offsets, then stream each partition once adding
  * offset + local position. Both passes read the same range-shuffle
  * output; nothing ever lands on one node.
  *
  * This is the sanctioned RDD case — genuinely per-partition
  * imperative logic (carrying a running accumulator through a sorted
  * iterator), which no Catalyst operator expresses without collapsing
  * to one partition.
  *
  * Callers must include a unique tiebreaker in `sortCols`: rows equal
  * on the full sort key may straddle a range boundary, and the global
  * order (hence index) of ties would otherwise be partitioner-
  * dependent.
  */
object TotalOrder {

  private def ranged(df: DataFrame, sortCols: Seq[Column]): DataFrame = {
    val n = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    df.repartitionByRange(n, sortCols: _*).sortWithinPartitions(sortCols: _*)
  }

  /** Attach a 0-based global position under `sortCols`' total order. */
  def globalIndex(df: DataFrame, sortCols: Seq[Column], outCol: String = "idx"): DataFrame = {
    val sorted = ranged(df, sortCols)
    val indexed = sorted.rdd.zipWithIndex() // two-pass: count job + offset map
      .map { case (row, i) => Row.fromSeq(row.toSeq :+ i) }
    df.sparkSession.createDataFrame(indexed,
      sorted.schema.add(StructField(outCol, LongType, nullable = false)))
  }

  /** Multi-epoch deterministic training shuffle: for each of `epochs`
    * passes over the data, a reproducible pseudo-random total order —
    * (id, epoch, position) with position 0..N−1 dense per epoch. The
    * order is md5(seed:epoch:id) (id as tiebreaker), so every engine,
    * run, and partitioning produces the SAME shuffle — the property a
    * training pipeline needs to resume mid-epoch or ablate data order.
    *
    * Shape: the epoch fan-out is a per-row `explode(sequence(...))`
    * (no join), then ONE range-partition pass assigns positions via
    * [[globalIndex]] over (epoch, key) — epochs are contiguous in that
    * total order and each holds exactly N rows, so the per-epoch
    * position is idx − epoch·N. No single-partition window at any
    * scale; N costs one count job over the un-exploded input.
    */
  def epochShuffle(df: DataFrame, idCol: String, epochs: Int,
                   seed: String = "graft"): DataFrame = {
    require(epochs >= 1, s"epochs must be >= 1, got $epochs")
    val n = df.count()
    val exploded = df.select(col(idCol))
      .withColumn("epoch", explode(sequence(lit(0), lit(epochs - 1))))
      .withColumn("__key",
        md5(concat_ws(":", lit(seed), col("epoch"), col(idCol))))
    globalIndex(exploded, Seq(col("epoch"), col("__key"), col(idCol)), "__g")
      .select(col(idCol), col("epoch").cast("long").as("epoch"),
        (col("__g") - col("epoch") * n).as("position"))
  }

  /** Attach the inclusive global running sum of LONG column `valueCol`
    * under `sortCols`' total order.
    */
  def prefixSum(df: DataFrame, sortCols: Seq[Column], valueCol: String,
                outCol: String = "cum"): DataFrame = {
    val sorted = ranged(df, sortCols)
    val vIdx = sorted.schema.fieldIndex(valueCol)
    val rdd = sorted.rdd
    // pass 1: per-partition totals — one long per partition to the driver
    val partials = rdd
      .mapPartitionsWithIndex { (pid, it) =>
        var s = 0L; it.foreach(r => s += r.getLong(vIdx)); Iterator((pid, s))
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = partials.scanLeft(0L)(_ + _) // offsets(p) = total before partition p
    val bc = df.sparkSession.sparkContext.broadcast(offsets)
    // pass 2: stream each partition once, accumulating from its offset
    val out = rdd.mapPartitionsWithIndex { (pid, it) =>
      var acc = bc.value(pid)
      it.map { r => acc += r.getLong(vIdx); Row.fromSeq(r.toSeq :+ acc) }
    }
    df.sparkSession.createDataFrame(out,
      sorted.schema.add(StructField(outCol, LongType, nullable = false)))
  }

  /** Greedy sequence packing for training: assign each document to a
    * fixed-token-budget pack, filling packs in `sortCols` order. A
    * document starting at global token offset t goes to pack
    * t / maxTokens — deterministic, single extra column, and packs are
    * contiguous under the given order so a downstream
    * `repartition(pack_id)` co-locates each pack.
    * (Documents longer than `maxTokens` still get exactly one pack —
    * real pipelines split those upstream.)
    */
  /** The pack-assignment rule, shared by [[packSequences]] and
    * [[packConcat]] so the boundary formula cannot drift between the
    * id view and the materialized view: a doc starting at global token
    * offset t (= inclusive cum − own tokens) goes to pack t/maxTokens.
    */
  private def withPackId(df: DataFrame, sortCols: Seq[Column], tokenCol: String,
                         maxTokens: Long, outCol: String): DataFrame = {
    require(maxTokens > 0, s"maxTokens must be positive, got $maxTokens")
    prefixSum(df, sortCols, tokenCol, "__cum")
      .withColumn(outCol, floor((col("__cum") - col(tokenCol)).cast("double") / maxTokens.toDouble).cast("long"))
  }

  def packSequences(df: DataFrame, sortCols: Seq[Column], tokenCol: String,
                    maxTokens: Long, outCol: String = "pack_id"): DataFrame =
    withPackId(df, sortCols, tokenCol, maxTokens, outCol).drop("__cum")

  /** Pack utilization report over a packed frame: docs, tokens, and
    * fill fraction per pack — the training-efficiency metric (padding
    * waste = 1 − utilization when packs are padded to the budget).
    * One hash-agg on pack_id; trailing packs under-fill by design.
    */
  def packUtilization(packed: DataFrame, budgetTokens: Long,
                      tokenCol: String = "n_tokens",
                      packCol: String = "pack_id"): DataFrame =
    packed.groupBy(packCol)
      .agg(count(lit(1)).as("n_docs"), sum(col(tokenCol)).as("n_tokens"),
        round(sum(col(tokenCol)) / lit(budgetTokens), 6).as("utilization"))

  /** Per-group packing: like [[packSequences]] but pack offsets reset
    * at each value of `groupCol`, so no pack ever straddles a group
    * (train/val/test shards must not mix). ONE global prefix sum over
    * (group, sortCols) plus a group-cardinality offset cumsum —
    * instead of one full prefix sum per group. The offset window is a
    * single-partition sort over #groups rows (3 for splits), bounded
    * by group cardinality, not data. pack_id is unique per
    * (group, pack_id). Rows with a NULL group get a NULL pack_id
    * (they are retained — the offset join is left-outer — but belong
    * to no group's pack order; assign them a real group upstream).
    */
  def packSequencesPerGroup(df: DataFrame, groupCol: String, sortCols: Seq[Column],
                            tokenCol: String, maxTokens: Long,
                            outCol: String = "pack_id"): DataFrame = {
    require(maxTokens > 0, s"maxTokens must be positive, got $maxTokens")
    import org.apache.spark.sql.expressions.Window
    val cum = prefixSum(df, col(groupCol) +: sortCols, tokenCol, "__cum")
    // group start offset = total tokens of all groups sorting before it
    // (same ascending group order as the prefix sum's range partitioning)
    val w = Window.orderBy(groupCol).rowsBetween(Window.unboundedPreceding, -1)
    val offsets = df.groupBy(groupCol).agg(sum(col(tokenCol)).as("__t"))
      .withColumn("__off", coalesce(sum("__t").over(w), lit(0L)))
      .drop("__t")
    cum.join(broadcast(offsets), Seq(groupCol), "left_outer")
      .withColumn(outCol,
        floor((col("__cum") - col(tokenCol) - col("__off")).cast("double") / maxTokens.toDouble)
          .cast("long"))
      .drop("__cum", "__off")
  }

  /** Materialize the packed sequences: one row per pack —
    * (pack_id, n_docs, n_tokens, pack_text) with member texts joined
    * in pack order. The training-shard output step after
    * [[packSequences]].
    *
    * Shape: one additional shuffle keyed by pack_id; each group is
    * bounded by the token budget (a pack never exceeds maxTokens plus
    * one document), so the collect_list per group is small by
    * construction. Within-pack order rides the inclusive prefix sum —
    * strictly increasing when every row has ≥1 token, so the
    * `array_sort` over (cum, text) structs is a total order with no
    * extra key.
    */
  def packConcat(df: DataFrame, sortCols: Seq[Column], tokenCol: String,
                 textCol: String, maxTokens: Long, sep: String = " "): DataFrame = {
    val packed = withPackId(df, sortCols, tokenCol, maxTokens, "pack_id")
    packed.groupBy("pack_id")
      .agg(count(lit(1)).as("n_docs"),
        sum(col(tokenCol)).as("n_tokens"),
        array_join(
          transform(array_sort(collect_list(struct(col("__cum"), col(textCol)))),
            s => s.getField(textCol)), sep).as("pack_text"))
  }
}
