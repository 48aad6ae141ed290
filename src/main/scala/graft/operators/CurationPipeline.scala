package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** The end-to-end training-data curation flow, composed from the
  * library's oracle-gated operators — the demonstration that the
  * pieces (each verified in isolation by `SparkEntry.queries`) chain
  * into the pipeline a pretraining-data team actually runs:
  *
  *   raw corpus
  *     → exact dedup (content-hash keep-first)          [DedupOps]
  *     → near-dup groups → keep-first survivors          [DedupOps]
  *     → deterministic stratified sampling               [CurationOps]
  *     → PII scrub                                       [CurationOps]
  *     → concat-and-chunk sequence packing               [CurationOps]
  *
  * Everything stays one declarative DataFrame flow until the packing
  * prefix-sum; no stage collects the corpus. The funnel counts are
  * computed on the returned frames by the caller (counting here would
  * force extra jobs on users who only want the packed output).
  */
object CurationPipeline {

  /** Intermediate frames of the flow, exposed for inspection/testing;
    * `packed` is the final training-shard layout.
    */
  case class Flow(raw: DataFrame, exactKept: DataFrame, neardupKept: DataFrame,
                  sampled: DataFrame, scrubbed: DataFrame, packed: DataFrame)

  def run(spark: SparkSession, sfDir: String): Flow = {
    val raw = Tables.documents(spark, sfDir).select(col("doc_id"), col("lang"), col("text"))

    // 1. exact dedup: one shuffle on the 128-bit content-key hash,
    //    min(doc_id) survivor per group, semi-joined back for full rows —
    //    the SAME keying as the oracle-gated docDedup, via the shared core
    val exactKept = raw.join(
      DedupOps.exactDedupSurvivorIds(raw), Seq("doc_id"), "left_semi")

    // 2. near-dup resolution among exact survivors: adaptive exact-
    //    Jaccard pairs → connected components → keep group roots
    val sh = exactKept.filter(length(col("text")) >= 5)
      .select(col("doc_id"), DedupOps.shingles(col("text"), 5).as("sh"))
    val pairs = DedupOps.jaccardNearDupPairs(sh, 0.5).select(col("doc_a"), col("doc_b"))
    val roots = DedupOps.connectedComponents(exactKept.select(col("doc_id")), pairs)
      .filter(col("doc_id") === col("group_id"))
      .select(col("doc_id"))
    val neardupKept = exactKept.join(roots, Seq("doc_id"), "left_semi")

    // 3-4. hash-quota language mix, then row-local scrub
    val sampled = CurationOps.stratifiedFilter(neardupKept)
      .select(col("doc_id"), col("lang"), col("text"))
    val scrubbed = sampled
      .withColumn("text", CurationOps.scrubbedText(col("text")))

    // 5. pack the curated corpus into fixed 2048-token sequences
    val packed = CurationOps.packSequencesFor(scrubbed)
    Flow(raw, exactKept, neardupKept, sampled, scrubbed, packed)
  }
}
