package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** RECORD LINKAGE (fuzzy entity resolution) — the master-data half of
  * deduplication the document families don't cover: matching DIRTY
  * string records (typos, dropped/doubled characters) back to a
  * canonical registry. The standard two-phase shape every MDM pipeline
  * runs at scale:
  *
  *   1. BLOCKING — candidates come from an equi-join on a cheap
  *      blocking key, never an all-pairs comparison (Fellegi–Sunter
  *      practice; same discipline as every near-dup family here:
  *      banded/bucketed candidates, linear in corpus for bounded block
  *      sizes). The key is the name's digit SUFFIX — the stable region
  *      under the head-of-string corruption classes modeled — so
  *      block cardinality is data-bounded (≈ registry/10⁴ per block).
  *   2. VERIFICATION — exact Levenshtein edit distance on the
  *      candidates only, threshold ≤ 2, best match per dirty record by
  *      (distance, canonical id) — a per-dirty-record window over
  *      block-bounded candidate lists.
  *
  * The dirty side is DERIVED deterministically from the registry (the
  * armored-payload convention — no synthesized inputs): key mod 10
  * selects a corruption class — 0 drops a character (deletion, d=1),
  * 5 doubles the '#' (insertion, d=1), 3 passes through clean (d=0) —
  * and the SAME derivation runs in the oracle, which replays
  * block-join + `levenshtein` + best-match ranking natively in the
  * oracle engine: two independent edit-distance implementations must
  * agree pair by pair for the hash to match.
  *
  * Both engines implement classic unit-cost Levenshtein
  * (insert/delete/substitute = 1), so the distance itself is
  * cross-engine exact — integer, no arithmetic convention anywhere on
  * the hash path.
  */
object LinkageOps {

  /** Dirty records derived from the canonical registry — keep
    * [[dirtySql]] in lockstep. */
  private[graft] def dirtyRecords(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir)
      .filter((col("c_custkey") % 10).isin(0L, 3L, 5L))
      .select(col("c_custkey").as("dirty_id"),
        when(col("c_custkey") % 10 === 0,
          // deletion: 'Customer#…' → 'Custmer#…'
          concat(lit("Custmer"), substring(col("c_name"), 9, 100)))
          .when(col("c_custkey") % 10 === 5,
            // insertion: double the '#'
            concat(substring(col("c_name"), 1, 9), substring(col("c_name"), 9, 100)))
          .otherwise(col("c_name"))
          .as("dirty_name"))

  private[graft] val dirtySql: String =
    """SELECT c_custkey AS dirty_id,
      |  CASE WHEN c_custkey % 10 = 0 THEN 'Custmer' || substring(c_name, 9, 100)
      |       WHEN c_custkey % 10 = 5 THEN substring(c_name, 1, 9) || substring(c_name, 9, 100)
      |       ELSE c_name END AS dirty_name
      |FROM customer WHERE c_custkey % 10 IN (0, 3, 5)""".stripMargin

  /** Blocking key: the name's trailing 4 characters (digit suffix).
    * Length-clamped to mirror the oracle's
    * `substring(s, length(s)-3, 4)` exactly: for strings shorter than
    * 4 chars DuckDB clamps the start position and yields the whole
    * string, whereas Spark's negative-start `substring(name, -4, 4)`
    * yields '' — so the short case is made explicit on the Spark side
    * rather than left to diverging engine conventions. Safe for
    * today's 'Customer#NNNNNNNNN' fixtures either way; the clamp makes
    * the helper reusable on free-form columns (r14 ADVICE). */
  private def blockOf(name: org.apache.spark.sql.Column) =
    when(length(name) < 4, name).otherwise(substring(name, -4, 4))

  def recordLinkage(spark: SparkSession, sfDir: String): DataFrame = {
    val dirty = dirtyRecords(spark, sfDir)
      .withColumn("blk", blockOf(col("dirty_name")))
    val canon = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_name"),
        blockOf(col("c_name")).as("blk"))
    val candidates = dirty.join(canon, "blk") // blocking equi-join — never all-pairs
      .select(col("dirty_id"), col("dirty_name"), col("c_custkey"), col("c_name"),
        levenshtein(col("dirty_name"), col("c_name")).cast("long").as("dist"))
      .filter(col("dist") <= 2)
    val best = Window.partitionBy(col("dirty_id"))
      .orderBy(col("dist"), col("c_custkey"))
    candidates
      .withColumn("rn", row_number().over(best))
      .filter(col("rn") === 1)
      .select(col("dirty_id"), col("c_custkey").as("matched_id"), col("dist"))
      .orderBy(col("dirty_id"))
  }

  val recordLinkageSql: String =
    s"""WITH dirty AS (
       |$dirtySql
       |), d AS (
       |  SELECT dirty_id, dirty_name,
       |    substring(dirty_name, length(dirty_name) - 3, 4) AS blk
       |  FROM dirty
       |), c AS (
       |  SELECT c_custkey, c_name,
       |    substring(c_name, length(c_name) - 3, 4) AS blk
       |  FROM customer
       |), cand AS (
       |  SELECT d.dirty_id, c.c_custkey,
       |    CAST(levenshtein(d.dirty_name, c.c_name) AS BIGINT) AS dist
       |  FROM d JOIN c ON d.blk = c.blk
       |  WHERE levenshtein(d.dirty_name, c.c_name) <= 2
       |), best AS (
       |  SELECT dirty_id, c_custkey AS matched_id, dist,
       |    row_number() OVER (PARTITION BY dirty_id ORDER BY dist, c_custkey) AS rn
       |  FROM cand
       |)
       |SELECT dirty_id, matched_id, dist FROM best WHERE rn = 1
       |ORDER BY dirty_id""".stripMargin
}
