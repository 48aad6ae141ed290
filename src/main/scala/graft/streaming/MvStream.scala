package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.plans.MvJoinRewrite

/** Streamed INCREMENTAL maintenance of the day×client join-aggregate
  * summary ([[MvJoinRewrite]]'s MV shape) — the append-only IVM loop a
  * warehouse table service runs: each arriving micro-batch of lineitem
  * facts joins the STATIC dimensions and appends its (client, day)
  * partial-aggregate DELTA rows; serving re-aggregates the accumulated
  * partials (count = Σ n_tx, amount = Σ exact decimals), so the merge
  * is associative to the cent and batch boundaries are unobservable —
  * the accumulated-state lifecycle shape (the substring/CDC precedent),
  * with NO streaming state store at all.
  *
  * At 100 TB the dimension join inside the batch is a broadcast of the
  * (bounded) dim tables reused per batch; the delta aggregate is
  * micro-batch-sized. Recovery is the stream's own checkpoint: a
  * failed batch re-runs and re-appends its delta.
  */
object MvStream {

  /** Append each micro-batch's (client_email, day, n_tx, amount, n_amt)
    * delta partials to `table`, encoding through the SAME
    * [[MvJoinRewrite.dayClientPartialsOf]] as the bulk build. */
  def appendMvDeltasStream(facts: DataFrame, sfDir: String,
      table: String): StreamingQuery =
    facts.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        MvJoinRewrite.dayClientPartialsOf(batch.sparkSession, sfDir, batch)
          .write.format("parquet").mode("append").saveAsTable(table)
        ()
      }
      .start()
}
