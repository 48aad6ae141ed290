package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.MultimodalOps

/** Streaming media-index maintenance — the multimodal twin of
  * [[VectorStream]]: newly arriving video payloads are multi-frame
  * decoded ([[MultimodalOps.decodeFrameHashes]] — the REAL codec pass)
  * and their per-sampled-frame dHashes appended into the PERSISTED
  * epoch-versioned frame-hash index, via `foreachBatch`.
  *
  * Same epoch contract as the vector and dedup families: each
  * micro-batch resolves the family's CURRENT epoch before appending,
  * so a rotation redirects a long-running ingest at the next batch
  * boundary while probes keep reading whichever epoch THEY resolved.
  * The decode is stateless per payload, so a stream-appended index is
  * row-identical to the same index built in one batch
  * (MediaStreamSpec) — at 100 TB this is the media ingest loop: every
  * video is decoded exactly once, on arrival, and near-dup queries
  * answer from 32 B/frame hash rows forever after.
  */
object MediaStream {

  /** `payloads` must carry (doc_id: long, payload: binary). Rides
    * [[VectorStream.appendLoop]] — ONE copy of the per-batch
    * epoch-resolution protocol across every index family.
    */
  def appendVideoFramesStream(payloads: DataFrame, base: String): StreamingQuery =
    VectorStream.appendLoop(payloads, base)(
      (_, _, batch) => MultimodalOps.decodeFrameHashes(batch),
      MultimodalOps.appendFrameHashes)
}
