package graft

import org.apache.spark.sql.functions._

import graft.operators.Materialize

/** The corpus/bounded materialization seam (Materialize.scala): the
  * policy must take the RELIABLE path exactly when the session has a
  * checkpoint directory, and the reliable path must preserve rows,
  * schema, and lineage truncation — the properties every converted
  * `.corpusCheckpoint()` site relies on.
  */
class MaterializeSpec extends SparkSpec {

  test("corpus() without a checkpoint dir keeps localCheckpoint semantics") {
    assert(spark.sparkContext.getCheckpointDir.isEmpty,
      "shared test session must not have a checkpoint dir — other suites " +
        "depend on the local path being the default")
    val df = spark.range(1000).select(col("id"), (col("id") % 7).as("k"))
    val out = Materialize.corpus(df)
    assert(out.count() === 1000L)
    // localCheckpoint → no reliable checkpoint file anywhere in the chain
    assert(out.queryExecution.toRdd.getCheckpointFile.isEmpty)
  }

  test("corpus() with a checkpoint dir takes the reliable path and " +
    "preserves rows + schema + truncated lineage") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    try {
      val df = spark.range(5000)
        .select(col("id"), (col("id") % 13).as("k"),
          md5(col("id").cast("string")).as("h"))
      val out = Materialize.corpus(df)
      // rows + schema survive the round trip
      assert(out.schema === df.schema)
      assert(out.count() === 5000L)
      assert(out.agg(sum(col("k"))).head().getLong(0) ===
        df.agg(sum(col("k"))).head().getLong(0))
      // reliable: checkpoint FILES exist under the configured dir
      val files = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(p => p.toString.contains("rdd-")).count()
      assert(files > 0, s"no reliable checkpoint files under $dir")
      // lineage truncated: the plan bottoms out in a scan of the
      // checkpointed RDD, not the original range
      val planStr = out.queryExecution.optimizedPlan.toString
      assert(!planStr.toLowerCase.contains("range"),
        s"lineage not truncated:\n$planStr")
      // and the frame is still usable in a self-join (the dominant
      // consumer shape at the converted sites)
      val joined = out.as("a").join(out.as("b"),
        col("a.k") === col("b.k")).count()
      assert(joined > 0)
    } finally {
      // restore the shared session invariant for later suites
      spark.sparkContext.setCheckpointDir(null)
      assert(spark.sparkContext.getCheckpointDir.isEmpty)
    }
  }
}
