package graft

import org.apache.spark.sql.functions._
import graft.operators.MultimodalOps

class MultimodalOpsSpec extends SparkSpec {

  test("decodeImageStub: deterministic dims from payload bytes, typed schema") {
    val s = spark; import s.implicits._
    val df = Seq((1L, Array[Byte](0, 0)), (2L, Array[Byte](63, 127)), (3L, Array.empty[Byte]))
      .toDF("doc_id", "payload")
    val got = MultimodalOps.decodeImageStub(df).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4))).toSeq
    assert(got === Seq(
      (1L, 16, 16, 3, 16L * 16 * 3),
      (2L, 16 + 63, 16 + 63 % 64, 3, 79L * 79 * 3),
      (3L, 16, 16, 3, 16L * 16 * 3)))
    // batch shape: rerun gives identical output (stateless partitions)
    val again = MultimodalOps.decodeImageStub(df).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4))).toSeq
    assert(got === again)
  }

  test("sampleFrames emits every k-th frame index; zero-frame items emit none") {
    val s = spark; import s.implicits._
    val df = Seq((1L, 10), (2L, 1), (3L, 0)).toDF("item", "n_frames")
    val got = MultimodalOps.sampleFrames(df, "n_frames", 4)
      .groupBy("item").agg(collect_list("frame_idx").as("f"))
      .orderBy("item").collect().map(r => (r.getLong(0), r.getSeq[Int](1))).toMap
    assert(got === Map(1L -> Seq(0, 4, 8), 2L -> Seq(0)))
    assert(!got.contains(3L)) // corrupt/zero-frame item → no phantom frame 0
  }

  test("multimodalMeta: payload bytes length matches text length for ASCII") {
    val m = MultimodalOps.multimodalMeta(spark, sf)
    assert(m.count() === Tables.documents(spark, sf).count())
    assert(m.filter(col("n_bytes") <= 0).count() === 0)
  }

  test("multimodalAnn: identical payloads get identical features/buckets; pairs thresholded") {
    val s = spark; import s.implicits._
    val payloads = Seq((1L, "same text"), (2L, "same text"), (3L, "different wording entirely"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    val feats = MultimodalOps.extractFeaturesStub(payloads, 64)
      .select(col("item_id"), col("feature"),
        graft.operators.SimilarityOps.annBucket(col("feature"), 8, 64).as("bucket"))
    val rows = feats.collect()
      .map(r => r.getLong(0) -> (r.getSeq[Float](1), r.getString(2))).toMap
    // identical media → identical pseudo-embedding → same LSH bucket
    assert(rows(1L)._1 === rows(2L)._1)
    assert(rows(1L)._2 === rows(2L)._2)
    // corpus-level operator: ordered pairs, all at/above the score floor
    val out = MultimodalOps.multimodalAnn(spark, sf).collect()
    assert(out.forall(r => r.getLong(0) < r.getLong(1)))
    assert(out.forall(r => r.getDouble(2) >= 0.25))
  }

  test("extractFeaturesStub: one fixed-dim vector per item, deterministic, ANN-composable") {
    val payloads = Tables.documents(spark, sf)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    val f = MultimodalOps.extractFeaturesStub(payloads, dim = 16)
    assert(f.count() === payloads.count())
    assert(f.filter(size(col("feature")) =!= 16).count() === 0)
    // deterministic across runs (same payload → same pseudo-embedding)
    val a = f.orderBy("item_id").limit(3).collect().map(_.getSeq[Float](1)).toSeq
    val b = MultimodalOps.extractFeaturesStub(payloads, dim = 16)
      .orderBy("item_id").limit(3).collect().map(_.getSeq[Float](1)).toSeq
    assert(a === b)
    // the output schema composes directly with the similarity operators
    assert(f.schema("feature").dataType ===
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType, containsNull = false))
  }
}
