package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** The reference's cleaning operators (SURVEY.md §2a T1-T3), generalized
  * and exercised on the `events` table.
  *
  *  - T2 first-wins dedup — reference: `drop_duplicates(subset=[ts,
  *    account]) keep='first'` (main.py:123). pandas "first" means arrival
  *    order; Spark's `dropDuplicates` keeps an *arbitrary* row per key, so
  *    for deterministic parity we define first-wins over an explicit
  *    arrival index (`event_id` here; the paginated source assigns
  *    page*limit+offset at ingest — see sources.PaginatedJsonSource).
  *  - T3 coerce-else-zero — reference: `pd.to_numeric(errors='coerce')
  *    .fillna(0)` (main.py:124-125) ≡ `coalesce(try_cast(...), 0)`.
  *  - T1 page concat — `pd.concat` (main.py:109) ≡ UNION ALL.
  *
  * Scale notes:
  *  - First-wins dedup is one shuffle on the dedup key (window partition),
  *    identical cost shape to groupBy-min; no global sort of the data is
  *    needed, only per-key ordering inside each hash partition. Skewed
  *    keys fall under AQE skew handling since Spark 3.
  *  - try_cast/coalesce are codegen'd row-local expressions — zero
  *    shuffle, fully pipelined into the scan.
  */
object Cleaning {

  /** Core first-wins dedup: keep, per distinct `keys` tuple, the row with
    * the smallest `arrival` value (pandas drop_duplicates keep='first'
    * semantics made deterministic — main.py:123). One shuffle on the key
    * columns; per-key ordering is partition-local.
    *
    * CONTRACT: `arrival` must be unique within each key group (an
    * ingestion-assigned index like arrival_idx/event_id). With duplicate
    * arrival values the surviving row is partition-order dependent —
    * exactly the nondeterminism this operator exists to remove.
    */
  def dedupFirstKeepFirst(df: DataFrame, keys: Seq[String], arrival: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(arrival))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Core coerce-else-zero (pd.to_numeric(errors='coerce').fillna(0),
    * main.py:124-125): parse failures become 0, rows are never dropped.
    */
  def coerceDecimalElseZero(c: Column, precision: Int = 10, scale: Int = 2): Column =
    coalesce(c.try_cast(s"decimal($precision,$scale)"),
      lit(0).cast(s"decimal($precision,$scale)"))

  /** First-wins dedup by (hour-truncated ts, user_id), arrival order =
    * event_id. Hour truncation exists to make real duplicate groups in the
    * testdata (raw ns timestamps are unique).
    */
  def dedupFirst(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"),
        date_trunc("hour", col("ts")).as("hour_ts"),
        col("event_type"), col("value"))
    dedupFirstKeepFirst(e, Seq("hour_ts", "user_id"), "event_id")
      .orderBy(col("event_id"))
  }

  val dedupFirstSql: String =
    """SELECT event_id, user_id, hour_ts, event_type, value FROM (
      |  SELECT event_id, user_id,
      |         CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_ts,
      |         event_type, value,
      |         row_number() OVER (
      |           PARTITION BY date_trunc('hour', ts), user_id
      |           ORDER BY event_id) AS rn
      |  FROM events)
      |WHERE rn = 1
      |ORDER BY event_id""".stripMargin

  /** Coerce-else-zero (T3): a dirty numeric string — the `k` digits from
    * `props` normally, the unparseable literal 'N/A' for error events —
    * goes through try_cast to DECIMAL(10,2); failures become 0, rows are
    * never dropped (main.py:124-125 semantics).
    */
  def coerceFill(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = when(col("event_type") === "error", lit("N/A"))
      .otherwise(regexp_extract(col("props"), "([0-9]+)", 1))
    Tables.events(spark, sfDir)
      .select(
        col("event_id"),
        coerceDecimalElseZero(raw).cast("double").as("amount"))
      .orderBy(col("event_id"))
  }

  val coerceFillSql: String =
    """SELECT event_id,
      |  CAST(COALESCE(TRY_CAST(
      |    CASE WHEN event_type = 'error' THEN 'N/A'
      |         ELSE regexp_extract(props, '([0-9]+)', 1) END
      |    AS DECIMAL(10,2)), CAST(0 AS DECIMAL(10,2))) AS DOUBLE) AS amount
      |FROM events
      |ORDER BY event_id""".stripMargin

  /** Page concat (T1): UNION ALL of per-page slices, bag semantics. The
    * slices simulate the paginated source's per-page frames
    * (main.py:101-116); `unionByName` is by-name so page schemas may have
    * reordered columns (JSON field order is not pinned).
    */
  def unionPages(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir).select(col("event_id"), col("event_type"), col("value"))
    val p0 = e.filter(col("event_id") < 300)
    val p1 = e.filter(col("event_id") >= 300 && col("event_id") < 600)
      .select(col("event_type"), col("value"), col("event_id")) // reordered on purpose
    val p2 = e.filter(col("event_id") >= 600)
    p0.unionByName(p1).unionByName(p2).orderBy(col("event_id"))
  }

  val unionPagesSql: String =
    """SELECT event_id, event_type, value FROM (
      |  SELECT event_id, event_type, value FROM events WHERE event_id < 300
      |  UNION ALL
      |  SELECT event_id, event_type, value FROM events WHERE event_id >= 300 AND event_id < 600
      |  UNION ALL
      |  SELECT event_id, event_type, value FROM events WHERE event_id >= 600)
      |ORDER BY event_id""".stripMargin
}
