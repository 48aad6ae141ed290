package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Storage-layout and shuffle-shaping utilities — the techniques that
  * decide whether a 100 TB join is one pass or a meltdown:
  *
  *  - **Bucketing** pre-shuffles a table ONCE at write time; two tables
  *    bucketed by the same key into the same bucket count then
  *    sort-merge-join with NO exchange on either side (asserted by
  *    LayoutSpec on the physical plan). The write cost amortizes over
  *    every subsequent join/aggregation on that key.
  *  - **Salting** breaks a skewed join key into `salt` sub-keys: the
  *    dimension side replicates ×salt (cheap — dims are small), the
  *    fact side picks a deterministic pseudo-random salt per row, so a
  *    hot key's rows spread over `salt` reducers instead of one. AQE's
  *    skew-join handles moderate skew automatically; explicit salting
  *    is for the pathological keys AQE's split granularity can't fix.
  */
object Layout {

  /** Sessions that probe persisted bucketed indexes pin bucketed reads
    * on: Spark's DisableUnnecessaryBucketedScan demotes a bucketed scan
    * when no operator requires the bucket distribution, which silently
    * drops bucket pruning (IN-filter probes) and scan-side co-location
    * (anti-join probes) — exactly what the index exists to provide.
    * SESSION-WIDE and deliberately never restored: a per-query toggle
    * would make other queries' plans depend on execution order, and
    * the only bucketed tables in this library are the index tables
    * themselves, so pinning cannot affect a non-index scan.
    */
  def pinBucketedReads(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")

  /** Resolved filesystem location of a (possibly dropped) managed table
    * — used to clear leftovers from a dead session before rebuilding:
    * the default in-memory catalog forgets tables at session end, but
    * their files remain in the warehouse.
    */
  def clearStaleTableLocation(spark: SparkSession, table: String): Unit = {
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val loc = new org.apache.hadoop.fs.Path(warehouse, table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
  }

  /** Write `df` bucketed + sorted by `key` as a saved table — the
    * co-location contract later joins rely on.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table)

  /** The shared idempotent-build protocol of every persisted index:
    * pin bucketed reads, and when the table is absent from this
    * session's catalog, clear any leftover location from a dead
    * session and run `build`. One place to fix the protocol instead
    * of one copy per index type.
    */
  def ensureTable(spark: SparkSession, name: String)(build: String => Unit): String = {
    pinBucketedReads(spark)
    if (!spark.catalog.tableExists(name)) {
      clearStaleTableLocation(spark, name)
      build(name) // the closure receives the SAME name the guard checked
    }
    name
  }

  /** Rewrite a bucketed table with the same bucket spec — the
    * small-files compaction an append-maintained index needs
    * periodically (every `mode("append")` lands one new file per
    * non-empty bucket per batch; after N appends each bucket is N
    * files and scan/open overhead grows linearly).
    *
    * Crash-safe ordering: the compacted copy is written DURABLY to a
    * side table first, and only then does the original drop and the
    * side table rename into its place — at every instant at least one
    * complete on-disk copy of the index exists (a failure between the
    * drop and the rename leaves the data recoverable under
    * `<table>_compacting`). Never delete-then-rewrite state you cannot
    * rebuild. Content and bucket layout are unchanged — spec-asserted
    * along with the file-count drop.
    *
    * Recovery scope, stated precisely: the `_compacting` copy protects
    * WITHIN-process failures, and its recovery after a process crash is
    * MANUAL (inspect the warehouse before re-running; the first
    * post-restart [[ensureTable]]/compaction call would otherwise
    * rebuild from source or clear the leftover). Under the default
    * in-memory catalog ALL index tables are per-process state anyway —
    * the catalog forgets them at session end and builders re-derive
    * them from source. Append-maintained state that must survive
    * restarts (initDedupIndex + appendToDedupIndex loops) needs a
    * persistent metastore (Hive) in production; the write/swap
    * ordering here is what makes that deployment safe.
    */
  def compactBucketed(spark: SparkSession, table: String, key: String, buckets: Int): Unit = {
    val tmp = table + "_compacting"
    spark.sql(s"DROP TABLE IF EXISTS $tmp")
    clearStaleTableLocation(spark, tmp)
    writeBucketed(spark.table(table), tmp, key, buckets)
    spark.sql(s"DROP TABLE IF EXISTS $table")
    clearStaleTableLocation(spark, table)
    spark.sql(s"ALTER TABLE $tmp RENAME TO $table")
  }

  /** Inner equi-join of a skewed fact table against a dimension with
    * key salting. Results are identical to `fact.join(dim, key)` —
    * every fact row matches exactly one replicated dim row (the one
    * sharing its salt). The salt is a deterministic hash of the whole
    * fact row, so the operator stays reproducible.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salt: Int): DataFrame = {
    val factSalted = fact.withColumn("__salt",
      pmod(xxhash64(fact.columns.map(col): _*), lit(salt.toLong)))
    val dimSalted = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(salt.toLong - 1))))
    factSalted.join(dimSalted, Seq(key, "__salt")).drop("__salt")
  }

  /** Hive-style partitioned write — the third layout lever beside
    * bucketing and salting: `partitionBy(col)` turns a predicate on the
    * partition column into DIRECTORY pruning, so a scan filtered to one
    * partition value never opens the other partitions' files at all
    * (`PartitionFilters` in the plan, asserted by LayoutSpec). At
    * 100 TB this is the difference between reading one day/language
    * shard and reading the lake; low-cardinality columns only — a
    * high-cardinality partition key produces millions of tiny files.
    */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write
      .format("parquet")
      .partitionBy(partitionCol)
      .mode("overwrite")
      .save(path)
}
