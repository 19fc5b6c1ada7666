package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data CLUSTERING for file skipping — Z-order
  * (Morton-curve) layout, the public technique behind Delta/Iceberg
  * `OPTIMIZE ZORDER BY` and the classic UB-tree literature.
  *
  * Partition pruning only helps the partition column; a query
  * filtering on a second column still scans every file. Sorting by
  * ONE column gives that column tight per-file min/max ranges (the
  * stats engines prune on) but leaves every other column's ranges as
  * wide as the table. Interleaving the BITS of several columns' ranks
  * into one sort key gives each participating column locality: a
  * filter on any of them skips most files by footer min/max alone —
  * no index structure, just row order.
  *
  * Shape: per column, map values to `2^bits` rank buckets using
  * SAMPLED range boundaries (`approxQuantile` — driver holds
  * `2^bits − 1` doubles per column, never the data; rank buckets, not
  * raw bits of the value, so skewed/arbitrary-range columns still
  * spread evenly). Bucket ids bit-interleave into the Morton value in
  * pure codegen'd expressions. The write is `repartitionByRange` on
  * the z-value (one sampled range shuffle — the same machinery as any
  * global sort) + `sortWithinPartitions`, so files tile the curve.
  */
object Layout {

  /** Rank-bucket id (0 .. 2^bits − 1) of `c` under sampled boundaries —
    * a codegen'd binary search ([[graft.functions.RankBucketExpr]]);
    * the pre-r10 higher-order `size(filter(array(...)))` form ran an
    * interpreted lambda per boundary per row (2^bits − 1 compares,
    * measured ~20× slower on the 2M-row EraseProbe write). NULL sorts
    * to bucket 0 (coalesce); NaN to the TOP bucket (Spark's total
    * order ranks NaN greatest) — both as before.
    */
  private def bucketOf(c: Column, boundaries: Array[Double]): Column =
    coalesce(graft.functions.native.rankBucket(c.cast("double"), boundaries), lit(0))

  /** Bit-interleave `buckets(d)` (each 0 .. 2^bits − 1) into the
    * Morton z-value: bit `i` of dimension `d` lands at position
    * `i * dims + d`. Constant-folded shifts/masks — whole-stage
    * codegen, no UDF.
    */
  private def morton(buckets: Seq[Column], bits: Int): Column = {
    val dims = buckets.size
    val pieces = for {
      (b, d) <- buckets.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftright(b.cast("long"), i).bitwiseAND(lit(1L)), i * dims + d)
    pieces.reduce(_.bitwiseOR(_))
  }

  /** `df` reordered along the Z-curve over `cols` (numeric), split
    * into `outPartitions` range partitions — write the result straight
    * to parquet and every output file covers a small hyper-rectangle
    * of the `cols` space, so min/max footer stats prune scans
    * filtering on ANY of them. `bits` rank bits per dimension
    * (dims × bits ≤ 63); nulls sort to bucket 0.
    */
  def zorder(df: DataFrame, cols: Seq[String], outPartitions: Int,
             bits: Int = 8): DataFrame = {
    require(cols.nonEmpty, "zorder needs at least one column")
    require(bits >= 1 && cols.size * bits <= 63,
      s"dims (${cols.size}) x bits ($bits) must fit a long")
    require(outPartitions >= 1, s"outPartitions must be positive, got $outPartitions")
    val nb = (1 << bits) - 1
    val probes = (1 to nb).map(_.toDouble / (nb + 1)).toArray
    // one sampling pass per column, boundaries bounded on the driver
    val bounds = cols.map(c => df.stat.approxQuantile(c, probes, 0.001))
    val z = morton(cols.zip(bounds).map { case (c, bs) => bucketOf(col(c), bs) }, bits)
    // partition on the EXACT tile id (z ÷ tile), not a sampled range of
    // raw z — the z-space extent is known statically, so tile borders
    // can be exact; sampled borders jitter and leave files straddling
    // two tiles, which widens their min/max box on every dimension
    val tile = math.max(1L, (1L << (cols.size * bits)) / outPartitions)
    df.withColumn("__z", z)
      .repartitionByRange(outPartitions, (col("__z") / tile).cast("long"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
