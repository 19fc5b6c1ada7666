package graft.streaming

import org.apache.spark.sql.DataFrame

/** Streaming hygiene gate — filter-on-ingest for a continuously-fed
  * training corpus: the SAME per-row kernels the batch pipeline's
  * stages 1-2 run (normalize, quality score, repetition, PII gates),
  * applied to a stream. Every gate is a stateless projection/filter,
  * so the streaming plan is the batch plan verbatim — no state store,
  * no watermark, per-micro-batch cost linear in arriving rows — and
  * batch/stream results can never diverge, because they are one code
  * path ([[graft.ext.CorpusPipeline.hygieneGate]]).
  *
  * The full ingest front door composes this with [[StreamingDedup]]
  * (the stateful step) downstream: gate first — dropping junk BEFORE
  * the dedup shuffle keeps fingerprint state and wire volume to
  * surviving docs only.
  */
object StreamingCorpusGate {

  /** `docs` may be a batch or streaming frame with a `text` column.
    * Emits surviving rows (text normalized) plus `quality_score`.
    */
  def gate(docs: DataFrame,
           cfg: graft.ext.CorpusPipeline.Config = graft.ext.CorpusPipeline.Config()): DataFrame =
    graft.ext.CorpusPipeline.hygieneGate(docs, cfg)
}
