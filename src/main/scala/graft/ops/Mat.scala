package graft.ops

import org.apache.spark.sql.DataFrame

/** Size-gated materialization boundary for shared subtrees.
  *
  * A frame that feeds two or more consumers is re-evaluated per
  * consumer unless it is materialized — at 100 TB that is a
  * linear-factor waste that scales WITH the data, so the pipeline
  * operators cut it with an eager `localCheckpoint`. But the
  * checkpoint is not free: one extra job plus a write+read of the
  * frame through the block manager (~0.1–0.3 s fixed even for tiny
  * frames). Below a few hundred MB of input, recomputing the subtree
  * is strictly cheaper than the round-trip.
  *
  * So the boundary follows the same switch-point discipline as every
  * operator family (docs/SCALE.md "Operator-variant switch points"):
  * materialize only when the subtree actually READS enough bytes for
  * recompute-avoidance to pay. The signal is the sum of leaf-relation
  * sizes in the optimized plan — for file scans that is real file
  * bytes (no CBO needed), and Spark propagates the child plan's stats
  * through a checkpoint's `LogicalRDD`, so the signal stays accurate
  * downstream of an earlier boundary.
  *
  * `graft.materialize.minInputBytes` (default 256 MiB) tunes the
  * switch; 0 forces every boundary on (the pre-gate behavior).
  * Cluster swap for the single-JVM `localCheckpoint`: persist
  * (DISK_ONLY) or a stage table — corpus-sized frames must not pin
  * executor memory.
  *
  * When NOT to gate — keep an unconditional `localCheckpoint`:
  *  - iterative consumers (the connected-components label loop):
  *    un-materialized recompute depth grows with the round count, so
  *    the gate's "recompute ≈ 2× the subtree" assumption breaks
  *    (A/B at sf0.1: dedup clustering 2.46 s gated vs 1.31 s forced);
  *  - kernel-heavy multi-consumer pipelines (corpus prepare): input
  *    bytes understate a normalize→quality→decontam chain's recompute
  *    cost (A/B: 5.1 s gated vs 3.0 s forced).
  */
object Mat {
  val ConfKey = "graft.materialize.minInputBytes"
  val DefaultMinInputBytes: Long = 256L << 20

  /** Bytes the subtree reads: sum of optimized-plan leaf stats. */
  def inputBytes(df: DataFrame): BigInt =
    df.queryExecution.optimizedPlan.collectLeaves()
      .map(_.stats.sizeInBytes).sum

  def shouldMaterialize(df: DataFrame): Boolean = {
    val min = BigInt(df.sparkSession.conf.getOption(ConfKey)
      .map(_.toLong).getOrElse(DefaultMinInputBytes))
    inputBytes(df) >= min
  }

  implicit final class MatOps(private val df: DataFrame) extends AnyVal {
    /** Eagerly materialize the frame iff its input size clears the
      * switch point; otherwise hand back the frame untouched (each
      * consumer recomputes the subtree — cheaper below the switch).
      */
    def matBoundary: DataFrame =
      if (shouldMaterialize(df)) df.localCheckpoint(true) else df
  }
}
