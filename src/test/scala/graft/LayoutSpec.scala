package graft

import org.apache.spark.sql.functions._
import graft.operators.Layout

class LayoutSpec extends SparkSpec {

  test("corpusTag: sanitizer-colliding corpus dirs map to distinct tags") {
    val a = "data/sf0.01"
    val b = "data/sf0_01"
    // the sanitized forms DO collide — only the raw-path hash separates
    // them, so one corpus can never silently serve the other's index
    assert(a.replaceAll("[^a-zA-Z0-9]", "_") === b.replaceAll("[^a-zA-Z0-9]", "_"))
    assert(Layout.corpusTag(a) !== Layout.corpusTag(b))
    // pin the format (String.hashCode is JVM-stable by spec): a tag
    // change would orphan every persisted index family on disk
    assert(Layout.corpusTag(a) === f"data_sf0_01_${a.hashCode & 0xFFFFFFFFL}%08x")
  }

  test("tableLocation resolves qualified tables from catalog metadata, not the warehouse") {
    val db = "graft_layout_spec_db"
    val dir = java.nio.file.Files.createTempDirectory("graft-db").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db LOCATION '$dir'")
    try {
      spark.sql(s"CREATE TABLE $db.loc_probe USING parquet AS SELECT 1 AS x")
      val loc = Layout.tableLocation(spark, s"$db.loc_probe").toString
      // the real location lives under the database's directory …
      assert(loc.contains(new java.io.File(dir).getName),
        s"$loc not under database location $dir")
      // … and is NOT the derived default-warehouse guess, which is what
      // clearStaleTableLocation would otherwise wrongly delete
      val derived = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"),
        s"$db.loc_probe".toLowerCase).toString
      assert(loc !== derived)
    } finally spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
  }

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

  test("epoch rotation: pinned readers keep their snapshot; rollback is a pointer flip") {
    val base = "graft_epoch_spec"
    val s = spark; import s.implicits._
    def build(rows: Seq[(Long, String)])(name: String): Unit =
      Layout.writeBucketed(rows.toDF("id", "v"), name, "id", 4)
    try {
      Layout.dropEpochFamily(spark, base)
      val t0 = Layout.ensureEpochIndex(spark, base)(build(Seq((1L, "a"), (2L, "b"))))
      assert(t0 === Layout.epochTable(base, 0))
      // idempotent resolve: no rebuild while the epoch is intact
      assert(Layout.ensureEpochIndex(spark, base)(_ =>
        fail("must not rebuild a published epoch")) === t0)
      // a reader resolves its snapshot BEFORE the rotation…
      val pinned = spark.table(t0)
      val t1 = Layout.rotateEpoch(spark, base) { name =>
        // …and DURING the new build the old epoch is still the published,
        // fully-readable index (probe-under-old-epoch)
        assert(Layout.currentEpochTable(spark, base) === Some(t0))
        assert(spark.table(t0).count() === 2)
        build(Seq((3L, "c")))(name)
      }
      assert(Layout.currentEpochTable(spark, base) === Some(t1))
      // the pinned snapshot is untouched by the flip
      assert(pinned.count() === 2)
      assert(spark.table(t1).count() === 1)
      // rollback: a pointer flip, no data movement
      assert(Layout.rollbackEpoch(spark, base) === t0)
      assert(Layout.currentEpochTable(spark, base) === Some(t0))
      assert(spark.table(t0).count() === 2)
      // retention: prune drops the rolled-back epoch, keeps the published one
      Layout.pruneEpochs(spark, base, keep = 1)
      assert(!spark.catalog.tableExists(t1))
      assert(spark.catalog.tableExists(t0))
    } finally {
      Layout.dropEpochFamily(spark, base)
    }
  }

  test("pointer cache: a publish from a cloned session is visible to the parent") {
    // r16 (the r15 advice item): currentEpoch caches pointer reads per
    // session; a publish through ANY session of this JVM must
    // invalidate every other session's cached entry — otherwise a
    // foreachBatch clone's rotation would leave the parent serving a
    // stale epoch whose table retention still retains.
    val base = "graft_epoch_xsess_spec"
    val s = spark; import s.implicits._
    def build(rows: Seq[(Long, String)])(name: String): Unit =
      Layout.writeBucketed(rows.toDF("id", "v"), name, "id", 2)
    try {
      Layout.dropEpochFamily(spark, base)
      val t0 = Layout.ensureEpochIndex(spark, base)(build(Seq((1L, "a"))))
      // parent session caches epoch 0
      assert(Layout.currentEpochTable(spark, base) === Some(t0))
      // a CLONED session (the foreachBatch shape) rotates the family
      val clone = spark.newSession()
      val t1 = Layout.rotateEpoch(clone, base)(build(Seq((2L, "b"))))
      // the parent must resolve the NEW epoch, not its cached one
      // (epoch 0's table still exists — existence checks alone would
      // serve the stale snapshot)
      assert(spark.catalog.tableExists(t0))
      assert(Layout.currentEpochTable(spark, base) === Some(t1))
    } finally {
      Layout.dropEpochFamily(spark, base)
    }
  }

  test("epoch ensure guards sidecars: a lost codebook rebuilds instead of failing probes") {
    val base = "graft_epoch_sc_spec"
    val s = spark; import s.implicits._
    var builds = 0
    def build(name: String): Unit = {
      builds += 1
      Layout.writeBucketed(Seq((1L, "a")).toDF("id", "v"), name, "id", 2)
      Seq((1, "cb")).toDF("cid", "c").write.format("parquet").saveAsTable(name + "_cb")
    }
    try {
      Layout.dropEpochFamily(spark, base, sidecars = Seq("_cb"))
      val t0 = Layout.ensureEpochIndex(spark, base, sidecars = Seq("_cb"))(build)
      assert(builds === 1)
      Layout.ensureEpochIndex(spark, base, sidecars = Seq("_cb"))(build)
      assert(builds === 1) // intact epoch resolves without rebuilding
      spark.sql(s"DROP TABLE ${t0}_cb") // half-present index
      val t1 = Layout.ensureEpochIndex(spark, base, sidecars = Seq("_cb"))(build)
      assert(builds === 2)
      assert(t1 === Layout.epochTable(base, 1))
      assert(spark.catalog.tableExists(t1 + "_cb"))
    } finally {
      Layout.dropEpochFamily(spark, base, sidecars = Seq("_cb"))
    }
  }

  test("compactBuckets: rewrites only overfull buckets; content, pinning, recovery intact") {
    val s = spark; import s.implicits._
    val name = "graft_compact_spec"
    def warehouseDir = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), name)
    def filesByBucket: Map[Int, Set[String]] =
      warehouseDir.listFiles().toSeq
        .filter(f => f.isFile && !f.getName.startsWith(".") && !f.getName.startsWith("_"))
        .flatMap(f => Layout.bucketIdOf(f.getName).map(_ -> f.getName))
        .groupBy(_._1).map { case (b, fs) => b -> fs.map(_._2).toSet }
    try {
      spark.sql(s"DROP TABLE IF EXISTS $name")
      Layout.clearStaleTableLocation(spark, name)
      Layout.pinBucketedReads(spark)
      // single writer task → exactly one file per bucket to start
      Layout.writeBucketed(
        (1L to 100L).map(i => (i, s"v$i")).toDF("id", "v").repartition(1), name, "id", 8)
      // one day's append: touches only the buckets its two ids hash to
      Seq((101L, "x"), (102L, "y")).toDF("id", "v").repartition(1)
        .write.format("parquet").bucketBy(8, "id").sortBy("id")
        .mode("append").saveAsTable(name)
      val before = filesByBucket
      val overfull = before.filter(_._2.size > 1).keySet
      assert(overfull.nonEmpty && overfull.size < before.size,
        s"append must leave SOME buckets compact for the O(bucket) assert: $before")
      val expect = spark.table(name).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      Layout.compactBuckets(spark, name, "id")
      val after = filesByBucket
      // O(overfull buckets), not O(table): untouched buckets keep their EXACT files
      before.filterNot(kv => overfull(kv._1)).foreach { case (b, fl) =>
        assert(after(b) === fl, s"bucket $b was compact and must not be rewritten")
      }
      overfull.foreach(b => assert(after(b).size === 1, s"bucket $b must compact to one file"))
      assert(spark.table(name).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet === expect)
      // the bucket contract survives the file-level swap: a self-join on the
      // bucket key plans with NO exchange on either side
      val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val j = spark.table(name).join(
          spark.table(name).withColumnRenamed("v", "v2"), "id")
        val plan = j.queryExecution.executedPlan.toString
        assert(plan.contains("SortMergeJoin") && !plan.contains("Exchange"),
          s"compacted table must stay co-located:\n$plan")
        assert(j.count() === 102)
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      }
      // crash recovery: a staged file left between stage and swap (the crash
      // window) REPLACES its bucket's live files on the next call
      val (b, liveNames) = filesByBucket.head
      val live = liveNames.map(n => new java.io.File(warehouseDir, n))
      val staging = new java.io.File(warehouseDir, ".compact")
      staging.mkdirs()
      val staged = new java.io.File(staging, f"compact-recovery_$b%05d.c000.snappy.parquet")
      java.nio.file.Files.copy(live.head.toPath, staged.toPath)
      Layout.compactBuckets(spark, name, "id")
      val recovered = filesByBucket(b)
      assert(recovered === Set(staged.getName),
        s"recovery must install the staged file for bucket $b: $recovered")
      assert(spark.table(name).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet === expect)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $name")
      Layout.clearStaleTableLocation(spark, name)
    }
  }

  test("runtime bloom filter from a selective build side prunes the probe scan") {
    // The shuffle-join analog of broadcast pruning: when one join side
    // carries a selective filter, Spark's InjectRuntimeFilter builds a
    // bloom filter from it and applies `might_contain` on the OTHER
    // side's scan — at 100 TB this skips most probe-side rows before
    // the shuffle. Off at test scale only because of the 10 GB
    // application-side threshold, so the spec lowers the thresholds to
    // prove the plan shape the production conf would produce.
    val prev = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.enabled").map(k => k -> spark.conf.get(k))
    try {
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // shuffle join
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val li = Tables.lineitem(spark, sf).select(col("l_orderkey"), col("l_quantity"))
      val urgent = Tables.orders(spark, sf)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      val j = li.join(urgent, li("l_orderkey") === urgent("o_orderkey"))
      val optimized = j.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain") &&
        optimized.contains("bloom_filter_agg"),
        s"expected an injected runtime bloom filter on the probe side:\n$optimized")
      // the filtered plan still returns exactly the unfiltered join's rows
      val expect = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf)
          .filter(col("o_orderpriority") === "1-URGENT"),
          col("l_orderkey") === col("o_orderkey")).count()
      assert(j.count() === expect)
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
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
