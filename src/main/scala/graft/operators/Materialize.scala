package graft.operators

import org.apache.spark.sql.Dataset
import org.apache.spark.storage.StorageLevel

/** Materialization policy for the engine's two frame classes — the
  * fault-tolerance seam between single-JVM local mode and a real
  * cluster (the round-10 review's one cluster-realism caveat).
  *
  * The engine materializes intermediate frames for two reasons:
  * (1) a frame feeds multiple consumers (self-joins, guard + join
  * sides) and recomputing it would repeat a corpus pass; (2) iterative
  * operators (connected components, BPE merge rounds, Lloyd
  * iterations) must truncate lineage or the logical plan grows
  * geometrically and the PLANNER itself OOMs (measured: star-CC
  * treeString heap exhaustion at round ~7).
  *
  * `localCheckpoint()` serves both needs at `local[n]` — one compute,
  * blocks in the executor store, lineage cut — and in a single-JVM
  * master there is no executor-loss failure mode, so it is also the
  * fastest SAFE choice there. On a multi-executor cluster it is NOT
  * safe for corpus-sized frames: lineage-truncated executor-memory
  * blocks are unrecoverable on executor loss, and a lost block fails
  * the job mid-flight.
  *
  * [[corpus]] therefore keys on whether the session has a RELIABLE
  * checkpoint directory (`sc.setCheckpointDir` — on a real deployment
  * that is HDFS/S3 and configuring it is standard practice; the
  * local-cluster proof run sets a local one):
  *
  *  - checkpoint dir configured → `persist(DISK_ONLY)` +
  *    reliable `checkpoint()` + unpersist. The persist makes the
  *    eager checkpoint's write job read computed blocks instead of
  *    re-running the lineage (Spark's documented recompute-on-
  *    checkpoint behavior), so the frame computes ONCE; the checkpoint
  *    file survives executor loss; lineage is truncated exactly like
  *    localCheckpoint, so iterative plan growth stays bounded.
  *  - no checkpoint dir (plain local mode) → `localCheckpoint()`,
  *    unchanged single-JVM behavior and cost.
  *
  * Bounded frames (model-sized: codebooks, d×w counter tables,
  * sidecars, 1-row summaries — every such site states its bound
  * inline) stay on plain `localCheckpoint()`: their loss window is a
  * few seconds of cheap recompute and their size never threatens an
  * executor store. Streaming `foreachBatch` bodies also stay local:
  * the stream engine re-runs a failed micro-batch from ITS checkpoint,
  * which is the recovery path for everything inside the batch.
  */
object Materialize {

  /** Materialize a CORPUS-SIZED frame (rows ∝ corpus: shingled docs,
    * signatures, exploded embedding components, candidate-pair lists,
    * CC frontier/label frames, classifier feature frames). Reliable
    * and lineage-truncated when the session has a checkpoint dir;
    * plain localCheckpoint in single-JVM local mode where executor
    * loss cannot happen.
    */
  def corpus[T](ds: Dataset[T]): Dataset[T] = {
    val sc = ds.sparkSession.sparkContext
    if (sc.getCheckpointDir.isEmpty) ds.localCheckpoint()
    else {
      val cached = ds.persist(StorageLevel.DISK_ONLY)
      try cached.checkpoint()
      finally cached.unpersist(blocking = false)
    }
  }

  /** `.corpusCheckpoint()` chain syntax for [[corpus]] — every
    * corpus-sized materialization site reads as one grep-able token,
    * so the corpus/bounded classification is auditable from the call
    * sites alone.
    */
  implicit class CorpusSyntax[T](private val ds: Dataset[T]) extends AnyVal {
    def corpusCheckpoint(): Dataset[T] = corpus(ds)
  }
}
