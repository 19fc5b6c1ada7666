package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream interval join — the attribution shape:
  * each purchase joins the same user's clicks from the preceding
  * `window`. This is the one Structured Streaming join whose state is
  * provably bounded: the equality key routes both streams to the same
  * task, the time-range predicate plus BOTH watermarks lets the state
  * store evict rows once the other side can no longer match them
  * (clicks older than watermark − window, purchases older than
  * watermark). Without the range bound the click state would grow
  * forever — the canonical unbounded-state mistake this module
  * exists to encode correctly.
  *
  * Batch twin: the same join predicate on static frames (used by the
  * equivalence spec); the streaming plan shuffles each side once on
  * user_id, identical to the batch shuffle-hash join at any scale.
  */
object StreamingJoin {

  /** clicks: (user_id, click_ts, click_id); purchases: (user_id,
    * buy_ts, amount). Both may be streaming or static. `delay` is the
    * allowed event-time lateness on each stream; `window` the
    * attribution span (purchase joins clicks within [buy−window, buy]).
    */
  def attributedPurchases(clicks: DataFrame, purchases: DataFrame,
                          window: String = "1 hour",
                          delay: String = "30 minutes"): DataFrame = {
    val c = (if (clicks.isStreaming) clicks.withWatermark("click_ts", delay) else clicks)
      .alias("c")
    val p = (if (purchases.isStreaming) purchases.withWatermark("buy_ts", delay) else purchases)
      .alias("p")
    p.join(c,
        col("p.user_id") === col("c.user_id") &&
          col("p.buy_ts") >= col("c.click_ts") &&
          col("p.buy_ts") <= col("c.click_ts") + expr(s"INTERVAL $window"))
      .select(col("p.user_id").as("user_id"), col("c.click_id").as("click_id"),
        col("c.click_ts").as("click_ts"), col("p.buy_ts").as("buy_ts"),
        col("p.amount").as("amount"))
  }
}
