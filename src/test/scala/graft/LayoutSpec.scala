package graft

import org.apache.spark.sql.functions._
import graft.operators.Layout

class LayoutSpec extends SparkSpec {

  test("bucketed tables sort-merge-join with NO shuffle exchange") {
    // warehouse dir (static conf) is set by TestSpark at session build
    val orders = Tables.orders(spark, sf).select("o_orderkey", "o_custkey")
    val lineitem = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    Layout.writeBucketed(orders, "b_orders", "o_orderkey", 4)
    Layout.writeBucketed(
      lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "b_lineitem", "o_orderkey", 4)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      // and it's still correct
      assert(joined.count() ===
        orders.join(lineitem, orders("o_orderkey") === lineitem("l_orderkey")).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("saltedJoin equals the plain join on skewed data") {
    val s = spark; import s.implicits._
    // 90% of fact rows hit one key — the classic skew shape
    val fact = ((1 to 900).map(i => ("hot", i)) ++ (1 to 100).map(i => (s"k${i % 7}", i)))
      .toDF("k", "v")
    val dim = Seq(("hot", "H"), ("k0", "A"), ("k1", "B"), ("k2", "C"),
      ("k3", "D"), ("k4", "E"), ("k5", "F"), ("k6", "G")).toDF("k", "label")
    val plain = fact.join(dim, "k").select("k", "v", "label")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSeq.sorted
    val salted = Layout.saltedJoin(fact, dim, "k", 8).select("k", "v", "label")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSeq.sorted
    assert(salted === plain)
    // the salt actually spreads the hot key across sub-keys
    val saltSpread = fact.filter(col("k") === "hot")
      .withColumn("salt", pmod(xxhash64(fact.columns.map(col): _*), lit(8L)))
      .select("salt").distinct().count()
    assert(saltSpread > 1)
  }

  test("partitioned write: a partition-column predicate prunes directories") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    try {
      Layout.writePartitioned(
        Tables.documents(spark, sf).select(col("doc_id"), col("lang"), col("text")),
        dir, "lang")
      val filtered = spark.read.parquet(dir).filter(col("lang") === "en")
      val scan = filtered.queryExecution.executedPlan.collectLeaves()
        .map(_.toString).mkString("\n")
      // pruning shows up as a PartitionFilters entry on the scan…
      assert(scan.contains("PartitionFilters") && scan.contains("lang"))
      // …and as the scan reading strictly fewer partitions than exist
      val langs = Tables.documents(spark, sf).select("lang").distinct().count()
      val readFiles = filtered.select(input_file_name()).distinct()
        .collect().map(_.getString(0))
      assert(readFiles.nonEmpty && readFiles.forall(_.contains("lang=en")))
      assert(langs > 1) // the assertion above is vacuous on a 1-lang corpus
      // values survive the round trip for the pruned partition
      val expect = Tables.documents(spark, sf).filter(col("lang") === "en").count()
      assert(filtered.count() === expect)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
