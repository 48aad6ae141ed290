package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** The driver's testdata generator has shipped `events.ts` in three different
  * parquet encodings across rounds: TIMESTAMP(NANOS) (read as LongType nanos
  * under `spark.sql.legacy.parquet.nanosAsLong`), timestamp[us] WITHOUT
  * timezone (Spark 4: TIMESTAMP_NTZ), and timestamp[us] WITH timezone
  * (TimestampType). Round 8 lost three oracle keys to a silent re-encoding
  * (ns→µs-NTZ) that `Tables.eventsWithTs` didn't normalize. This spec pins
  * the contract: every event-key builder must ANALYZE and produce IDENTICAL
  * results under all three encodings of the same underlying instants.
  */
class TsEncodingSpec extends SparkSpec {

  private val eventKeys =
    Seq("q_event_windows", "q_user_sessions", "q_sessions_skewsafe",
      "q_range_join", "q_json_extract",
      // the streamed lifecycle rides the same events scan; a ts
      // re-encoding must not slip past the watermark/window path either
      "q_events_lifecycle")

  test("event keys analyze and agree under ns-as-long, µs-NTZ, and µs-LTZ ts encodings") {
    val s = spark
    val root = java.nio.file.Files.createTempDirectory("graft-tsenc")
    try {
      // Tables.events normalizes whatever sf0.001 currently ships to
      // session-zoned TimestampType; that is the value-level ground truth.
      val base = Tables.events(s, sf)

      // µs-LTZ: plain TimestampType column.
      base.write.parquet(s"$root/ltz/events.parquet")
      // µs-NTZ: session is pinned UTC, so the NTZ wall-clock values denote
      // the same instants the LTZ column does.
      base.withColumn("ts", col("ts").cast(TimestampNTZType))
        .write.parquet(s"$root/ntz/events.parquet")
      // ns-as-long: what the nanosAsLong session conf turns TIMESTAMP(NANOS)
      // into at scan time — a raw LongType nanos column.
      base.withColumn("ts", (unix_micros(col("ts")) * lit(1000L)).cast(LongType))
        .write.parquet(s"$root/ns/events.parquet")

      for (key <- eventKeys) {
        val expect = SparkEntry.queries(key)(s, sf).collect().map(_.toString).toSeq
        for (enc <- Seq("ltz", "ntz", "ns")) {
          val got = SparkEntry.queries(key)(s, s"$root/$enc").collect()
            .map(_.toString).toSeq
          assert(got === expect, s"$key under $enc encoding diverged")
        }
      }
    } finally {
      // the lifecycle key rotates an epoch family per corpus dir — drop
      // the per-temp-dir families along with the temp data
      for (enc <- Seq("ltz", "ntz", "ns", ""))
        graft.operators.Layout.dropEpochFamily(s,
          graft.operators.EventOps.eventsLifecycleBase(
            if (enc.isEmpty) sf else s"$root/$enc"))
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(root).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }
}
