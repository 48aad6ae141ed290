package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{GovernanceOps, Layout}

/** Streaming maintenance of the physical-layout index families — the
  * ingest side of the zone-map story: arrivals land as new files whose
  * extent stats append to the `_zmap` sidecar, batch-grain, with no
  * streaming state store (a new file's min/max/count is purely local to
  * its batch). The epoch is resolved per batch like every other index
  * append stream (see [[VectorStream.appendLoop]]'s contract).
  */
object LayoutStream {

  /** Append each micro-batch of (o_orderkey, k, d, prio, cents) rows to
    * the CURRENT zone-map epoch of `base`: one new data file (a fresh
    * file_id partition) + one new extent row per batch.
    */
  def appendZonemapStream(rows: DataFrame, base: String): StreamingQuery =
    rows.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val name = Layout.currentEpochTable(batch.sparkSession, base)
          .getOrElse(sys.error(s"no published epoch for index family $base"))
        GovernanceOps.appendZonemapBatch(name, batch, batchId)
        ()
      }
      .start()

  /** Streamed ingest for a BLOOM-indexed epoch: the zonemap protocol
    * plus the new file's bloom rows (membership stats are batch-local
    * like extents — see [[GovernanceOps.appendBloomBatch]]). */
  def appendBloomStream(rows: DataFrame, base: String): StreamingQuery =
    rows.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val name = Layout.currentEpochTable(batch.sparkSession, base)
          .getOrElse(sys.error(s"no published epoch for index family $base"))
        GovernanceOps.appendBloomBatch(name, batch, batchId)
        ()
      }
      .start()

  /** Streamed DELETE for the merge-on-read family: each micro-batch of
    * (o_orderkey) keys appends tombstone rows to the CURRENT epoch's
    * `_dv` sidecar — metadata-only maintenance, no data file touched,
    * no state store (a tombstone is batch-local). `uptoFile` is the
    * commit sequence the delete observed (rows in files ≤ it are
    * voided), fixed for the whole stream by the caller. */
  def appendTombstoneStream(keys: DataFrame, base: String,
      uptoFile: Long): StreamingQuery =
    keys.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val name = Layout.currentEpochTable(batch.sparkSession, base)
          .getOrElse(sys.error(s"no published epoch for index family $base"))
        GovernanceOps.appendTombstones(batch.sparkSession, name,
          batch, uptoFile)
        ()
      }
      .start()
}
