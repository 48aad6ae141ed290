package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Layout

/** Streaming CDC ingestion: the change-log ("bronze") half of a
  * streamed dimension pipeline. Each micro-batch of typed change
  * records appends into the CURRENT epoch of the change-log table —
  * per-batch epoch resolve like every index maintainer in this repo,
  * so a rotation redirects the stream at the next batch boundary.
  *
  * The append is STATELESS by design: SCD2 history cannot be folded
  * into bounded per-key streaming state (any old version remains
  * addressable), so the production shape — Delta/Hudi-style CDC
  * ingestion — is exactly this: append the log, build versions from
  * the accumulated row SET. That build
  * ([[graft.operators.GovernanceOps.scd2Over]]) sorts each key's rows
  * by (ts, seq) internally, so batch boundaries and replay order are
  * unobservable downstream — the accumulated-state lifecycle shape
  * (the substring-dedup precedent, lifecycle #8).
  */
object CdcStream {

  def appendChangesStream(changes: DataFrame, base: String): StreamingQuery =
    changes.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val name = Layout.currentEpochTable(batch.sparkSession, base)
          .getOrElse(sys.error(s"no published epoch for change-log family $base"))
        batch.write.mode("append").format("parquet").saveAsTable(name)
        ()
      }
      .start()
}
