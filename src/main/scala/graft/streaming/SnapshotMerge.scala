package graft.streaming

import graft.store.Warehouse
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Streaming upsert into a versioned snapshot table — the r8 write
  * surface composed into a `foreachBatch` sink: each micro-batch is
  * MERGE'd (matched → update all non-key columns, unmatched → insert)
  * against the current snapshot and committed with the
  * optimistic-concurrency CAS, retrying on conflict so several streams
  * (or a stream racing a batch restatement) can share one table with
  * no lost update.
  *
  * Replay safety — the exactly-once-effect contract `foreachBatch`
  * needs: identical full-row duplicates within a batch are folded
  * before the merge, and a REPLAYED batch (post-failure re-delivery)
  * upserts the same values onto themselves, so the final table state
  * is identical whether a batch ran once or thrice. Duplicate keys
  * with CONFLICTING values in one batch are the caller's bug and fail
  * fast in [[Warehouse.mergeInto]] (nondeterministic last-wins is the
  * silent-corruption alternative); pre-aggregate the batch if that is
  * the intended semantics.
  *
  * Readers see snapshot isolation throughout: each micro-batch is one
  * new immutable version, never a half-written table.
  */
object SnapshotMerge {

  /** The sink function: `stream.writeStream.foreachBatch(SnapshotMerge
    * .upsertBatch(root, keys) _)`. Bootstrap: an absent/empty table
    * makes the first batch all-inserts.
    */
  def upsertBatch(root: String, keys: Seq[String], maxRetries: Int = 10)
                 (batch: DataFrame, batchId: Long): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    // materialized once: the fold's shuffle and mergeInto's uniqueness
    // probe would otherwise re-run per conflict retry
    val folded = batch.dropDuplicates().localCheckpoint(true)
    val updateSet = folded.columns.filterNot(keys.contains)
      .map(c => c -> col(s"s.$c")).toMap
    // the shared CAS loop (r16): the body re-reads the current version
    // and re-derives the merge per attempt, per retryOnConflict's
    // contract
    Warehouse.retryOnConflict(maxRetries) {
      val cur = Warehouse.currentSnapshot(spark, root)
      val target =
        if (cur == 0L)
          spark.createDataFrame(spark.sparkContext.emptyRDD[Row], folded.schema)
        else Warehouse.readSnapshot(spark, root, Some(cur))
      val merged = Warehouse.mergeInto(target, folded, keys, Seq(
        Warehouse.UpdateWhen(lit(true), updateSet),
        Warehouse.InsertWhen(lit(true))))
      // the merged state is mostly COMMITTED rows: X215 triage stays
      // off, or an update whose new value violates a drop rule would
      // silently delete the key (review r11) — expectations gate the
      // append-style ingest sinks, not this full-state rewrite
      Warehouse.commitSnapshot(merged, root, cur, triage = false)
    }
    ()
  }
}
