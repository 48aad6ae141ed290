package graft

// Spark 4.1 moved MemoryStream under execution.streaming.runtime
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.{Layout, MultimodalOps}
import graft.streaming.MediaStream

/** Streaming media-index maintenance: a stream-appended frame-hash
  * epoch must be indistinguishable — rows AND near-dup answers — from
  * the same index built in one batch (the vector family's contract,
  * proven here for the media family; the decode is stateless per
  * payload, so any divergence would mean cross-row state leaked into
  * the codec path).
  */
class MediaStreamSpec extends SparkSpec {

  test("stream-appended frame-hash index ≡ batch-built; near-dup answers identical") {
    val s = spark; import s.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = "graft_vframe_stream_spec"
    val refBase = "graft_vframe_stream_ref"
    Layout.dropEpochFamily(spark, base)
    Layout.dropEpochFamily(spark, refBase)
    try {
      val all = MultimodalOps.syntheticVideos(spark, sf)
      val cut = 250L
      def buildFrom(payloads: org.apache.spark.sql.DataFrame)(name: String): Unit =
        Layout.writeBucketed(MultimodalOps.decodeFrameHashes(payloads),
          name, "doc_id", MultimodalOps.MediaIndexBuckets)

      // epoch 0: decoded from the first half only
      Layout.rotateEpoch(spark, base)(
        buildFrom(all.filter(col("doc_id") < cut)))
      val e0 = Layout.currentEpochTable(spark, base).get

      // stream the second half's PAYLOADS in three micro-batches —
      // each batch goes through the real multi-frame decode
      val rest = all.filter(col("doc_id") >= cut)
        .as[(Long, Array[Byte])].collect().toSeq
      val mem = MemoryStream[(Long, Array[Byte])]
      val q = MediaStream.appendVideoFramesStream(
        mem.toDS().toDF("doc_id", "payload"), base)
      try {
        rest.grouped(rest.length / 3 + 1).foreach { g =>
          mem.addData(g: _*); q.processAllAvailable()
        }
      } finally q.stop()

      // reference: ONE batch decode over the full corpus
      Layout.rotateEpoch(spark, refBase)(buildFrom(all))
      val ref = Layout.currentEpochTable(spark, refBase).get
      spark.catalog.refreshTable(e0) // appends ran in a cloned session

      def rows(t: String) = spark.table(t).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(rows(e0) === rows(ref))

      // near-dup answers identical over both, and identical to the
      // corpus-keyed operator (which rides its own index family)
      def pairs(t: String) = MultimodalOps.videoNearDupFrom(spark.table(t))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      val got = pairs(e0)
      assert(got === pairs(ref))
      assert(got.nonEmpty)
      val op = MultimodalOps.videoNearDup(spark, sf)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      assert(got === op)
      // streamed docs participate (pairs above the cut prove liveness)
      assert(got.exists(p => p._1 >= cut || p._2 >= cut),
        s"no streamed video in the pair set")
    } finally {
      Layout.dropEpochFamily(spark, base)
      Layout.dropEpochFamily(spark, refBase)
    }
  }

  test("mediaLifecycle: half-built + streamed-half epoch answers the one-pass query") {
    import graft.operators.MultimodalOps
    try {
      // one-pass twin over the lifecycle's quarter corpus (hamming is
      // pair-local and banding per-doc, so filtering the full-corpus
      // pairs to quarter members IS the quarter-corpus answer)
      val expected = MultimodalOps.videoNearDup(spark, TestSpark.sf0001)
        .collect().toSeq
        .filter(r => r.getLong(0) % 4 == 0 && r.getLong(1) % 4 == 0)
      val got = MultimodalOps.mediaLifecycle(spark, TestSpark.sf0001)
        .collect().toSeq
      assert(got === expected)
      assert(got.nonEmpty, "quarter corpus produced no near-dup pairs")
    } finally {
      Layout.dropEpochFamily(spark,
        MultimodalOps.mediaLifecycleBase(TestSpark.sf0001))
      Layout.dropEpochFamily(spark,
        MultimodalOps.frameHashIndexName(TestSpark.sf0001))
    }
  }
}
