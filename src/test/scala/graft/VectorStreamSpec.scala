package graft

// Spark 4.1 moved MemoryStream under execution.streaming.runtime
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.{Layout, SimilarityOps}
import graft.streaming.VectorStream

/** Streaming ANN index maintenance: a stream-appended epoch must be
  * indistinguishable — contents and probe answers — from the same
  * index built in one batch, and appends must follow the epoch
  * pointer across a rotation (the dedup family's contract, proven
  * here for the vector family).
  */
class VectorStreamSpec extends SparkSpec {

  test("stream-appended IVF index ≡ batch-built index; appends follow the epoch pointer") {
    val s = spark; import s.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = "graft_ivft_stream_spec"
    val refBase = "graft_ivft_stream_ref"
    Layout.dropEpochFamily(spark, base, sidecars = Seq("_codebook"))
    Layout.dropEpochFamily(spark, refBase, sidecars = Seq("_codebook"))
    try {
      val all = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
      val cut = 250L
      // epoch 0: built from the first half only (query vector 0 included)
      Layout.rotateEpoch(spark, base, sidecars = Seq("_codebook"))(
        SimilarityOps.buildVectorEpoch(spark, sf, all.filter(col("vec_id") < cut)))
      val e0 = Layout.currentEpochTable(spark, base).get
      val builtRows = spark.table(e0).count()

      // stream the second half in three micro-batches
      val rest = all.filter(col("vec_id") >= cut)
        .as[(Long, Seq[Float])].collect().toSeq
      val mem = MemoryStream[(Long, Seq[Float])]
      val q = VectorStream.appendVectorsStream(
        mem.toDS().toDF("vec_id", "embedding"), base)
      try {
        rest.grouped(rest.length / 3 + 1).foreach { g =>
          mem.addData(g: _*); q.processAllAvailable()
        }
      } finally q.stop()

      // reference: ONE batch build over the full vector set (identical
      // deterministic codebook — trained from the same corpus dir)
      Layout.rotateEpoch(spark, refBase, sidecars = Seq("_codebook"))(
        SimilarityOps.buildVectorEpoch(spark, sf, all))
      val ref = Layout.currentEpochTable(spark, refBase).get

      // the appends ran in foreachBatch's CLONED session — this parent
      // session's cached file listing for the epoch table is stale
      spark.catalog.refreshTable(e0)

      // index contents identical (vector → cell assignment sets)
      def cellsOf(t: String) = spark.table(t).select(col("vec_id"), col("cell"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(cellsOf(e0) === cellsOf(ref))
      assert(spark.table(e0).count() === all.count())

      // probe answers identical, and the top-k actually uses streamed
      // vectors (results above the cut prove the appends are LIVE)
      def probe(t: String) = SimilarityOps.probeIndexWithCodebook(spark, t, all)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val got = probe(e0)
      assert(got === probe(ref))
      assert(got.size === 10)
      assert(got.exists(_._1 >= cut), s"no streamed vector in top-k: $got")

      // rotation: a fresh (half) epoch publishes; the stream's next
      // batch must land in the NEW epoch and leave the old one alone
      Layout.rotateEpoch(spark, base, sidecars = Seq("_codebook"))(
        SimilarityOps.buildVectorEpoch(spark, sf, all.filter(col("vec_id") < cut)))
      val e1 = Layout.currentEpochTable(spark, base).get
      assert(e1 !== e0)
      val mem2 = MemoryStream[(Long, Seq[Float])]
      val q2 = VectorStream.appendVectorsStream(
        mem2.toDS().toDF("vec_id", "embedding"), base)
      try {
        mem2.addData(rest.take(7): _*); q2.processAllAvailable()
      } finally q2.stop()
      spark.catalog.refreshTable(e1)
      assert(spark.table(e1).count() === builtRows + 7)
      // probe-under-old-epoch: the superseded epoch still answers, unchanged
      assert(spark.table(e0).count() === all.count())
      assert(probe(e0) === probe(ref))
    } finally {
      Layout.dropEpochFamily(spark, base, sidecars = Seq("_codebook"))
      Layout.dropEpochFamily(spark, refBase, sidecars = Seq("_codebook"))
    }
  }

  test("stream-appended IVF×PQ index ≡ batch-built: codes and probe answers identical") {
    val s = spark; import s.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = "graft_ivfpq_stream_spec"
    val refBase = "graft_ivfpq_stream_ref"
    val sc = Seq("_coarse", "_books")
    Layout.dropEpochFamily(spark, base, sidecars = sc)
    Layout.dropEpochFamily(spark, refBase, sidecars = sc)
    try {
      val all = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
      val cut = 250L
      // epoch 0: codes for the first half only (codebooks are
      // corpus-seeded, so both epochs share them deterministically)
      Layout.rotateEpoch(spark, base, sidecars = sc)(
        SimilarityOps.buildIvfPqEpoch(spark, sf, all.filter(col("vec_id") < cut)))
      val e0 = Layout.currentEpochTable(spark, base).get

      // stream the second half in three micro-batches
      val rest = all.filter(col("vec_id") >= cut)
        .as[(Long, Seq[Float])].collect().toSeq
      val mem = MemoryStream[(Long, Seq[Float])]
      val q = VectorStream.appendVectorsStreamIvfPq(
        mem.toDS().toDF("vec_id", "embedding"), base)
      try {
        rest.grouped(rest.length / 3 + 1).foreach { g =>
          mem.addData(g: _*); q.processAllAvailable()
        }
      } finally q.stop()

      // reference: ONE batch build over the full vector set
      Layout.rotateEpoch(spark, refBase, sidecars = sc)(
        SimilarityOps.buildIvfPqEpoch(spark, sf, all))
      val ref = Layout.currentEpochTable(spark, refBase).get
      spark.catalog.refreshTable(e0) // appends ran in a cloned session

      // code rows identical: stream-encoded vectors are
      // indistinguishable from built ones (same codebooks, same
      // integer argmins)
      def rows(t: String) = spark.table(t).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Int](2))).toSet
      assert(rows(e0) === rows(ref))
      assert(spark.table(e0).count() === all.count())

      // probe answers identical, and the top-k reaches streamed codes
      val q0 = all.filter(col("vec_id") === 0)
        .select(transform(col("embedding"),
          x => floor(x.cast("double") * 1000000d + 0.5d).cast("long")))
        .head().getSeq[Long](0).toArray
      def probe(t: String) = SimilarityOps.probeIvfPqIndex(spark, t, q0)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val got = probe(e0)
      assert(got === probe(ref))
      assert(got.size === 10)
      assert(got.exists(_._1 >= cut), s"no streamed vector in top-k: $got")
    } finally {
      Layout.dropEpochFamily(spark, base, sidecars = sc)
      Layout.dropEpochFamily(spark, refBase, sidecars = sc)
    }
  }
}
