package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming ingest dedup — the front door of a continuously-fed
  * training corpus: drop any document whose (normalized-text)
  * fingerprint was already seen within the watermark horizon.
  * Batch twin: `ext.Dedup.exact` (same normalize→hash key).
  *
  * Built on `dropDuplicatesWithinWatermark`, so state is ONE
  * fingerprint row per distinct document, evicted once the event-time
  * watermark passes — bounded state at any scale, shuffled once by
  * fingerprint. The watermark delay is the dedup guarantee window:
  * duplicates arriving within `delay` of each other are always
  * caught; re-crawls farther apart than the horizon re-enter (and are
  * the batch dedup's job downstream).
  */
object StreamingDedup {

  /** `docs` must be a streaming DataFrame with an event-time column
    * `tsCol`. Emits the surviving rows plus their `fp` fingerprint.
    */
  def dedupByContent(docs: DataFrame,
                     delay: String = "10 minutes",
                     tsCol: String = "ts",
                     textCol: String = "text"): DataFrame =
    docs
      .withColumn("fp",
        graft.ext.TextAnalysis.fingerprintMd5(
          graft.ext.TextAnalysis.normalizeText(col(textCol))))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("fp")
}
