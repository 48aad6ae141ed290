package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Deduplication operators for an LLM-data pipeline (SURVEY.md §2b):
  * exact dedup, n-gram Jaccard near-dup pairs (the verifiable baseline),
  * and MinHash-LSH near-dup (the 100 TB path).
  *
  * Scale notes:
  *  - Exact dedup is a groupBy on a 128-bit content hash — one shuffle,
  *    map-side partial agg, no skew risk (hashes are uniform). At 100 TB
  *    group by the hash, never the raw text (shuffle bytes ∝ 32-char key
  *    vs document body).
  *  - Pairwise Jaccard via shingle self-join is quadratic in the worst
  *    case (all-identical corpus); it exists as the exact oracle-checkable
  *    baseline and for small candidate sets. The prefilter (pairs must
  *    share ≥1 shingle) bounds it in practice.
  *  - MinHash-LSH is the scale path: signature = k independent min-hashes
  *    over shingles (here: min md5(seed‖shingle), deterministic in any
  *    engine), banded into b bands; candidate pairs share a band bucket.
  *    Cost: one shuffle on (band, bucket) — linear in corpus size +
  *    bucket-local pair generation. This is the standard
  *    shingle→minhash→band→bucket-join pipeline (Broder '97 / MMDS ch.3).
  */
object DedupOps {

  /** Character n-gram shingle set (distinct) of a string column.
    * Caller must guarantee length(c) >= n (sequence(1, stop) needs
    * stop >= 1 — Spark's sequence defaults to a NEGATIVE step when
    * start > stop, it does not return empty).
    */
  def shingles(c: Column, n: Int): Column =
    array_distinct(transform(
      sequence(lit(1), length(c) - (n - 1)),
      i => c.substr(i, lit(n))))

  /** Exact near-duplicate groups keyed on the first 40 chars of `text`
    * (the testdata plants shared prefixes; real pipelines key on
    * `md5(normalized text)` — see TextOps.docFingerprint). Keeps the
    * first (min doc_id) representative per group, reports group size.
    */
  def docDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val key = substring(col("text"), 1, 40)
    Tables.documents(spark, sfDir)
      .groupBy(md5(key).as("key_hash"))
      .agg(
        min(col("doc_id")).as("doc_id"),
        count(lit(1)).as("dup_count"))
      .select(col("doc_id"), col("key_hash"), col("dup_count"))
      .orderBy(col("doc_id"))
  }

  val docDedupSql: String =
    """SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id,
      |  md5(substring(text, 1, 40)) AS key_hash,
      |  CAST(COUNT(*) AS BIGINT) AS dup_count
      |FROM documents
      |GROUP BY md5(substring(text, 1, 40))
      |ORDER BY doc_id""".stripMargin

  /** Exact pairwise n-gram Jaccard near-dup pairs (threshold 0.5) over
    * 5-gram character shingles. Shingle-inverted-index self-join:
    * pairs sharing ≥1 shingle → |A∩B| by count, |A∪B| = |A|+|B|−|A∩B|.
    * Jaccard is an exact integer-ratio double — engine-deterministic.
    */
  def ngramJaccard(spark: SparkSession, sfDir: String): DataFrame = {
    val n = 5
    val docs = Tables.documents(spark, sfDir)
      .filter(length(col("text")) >= n)
      .select(col("doc_id"), shingles(col("text"), n).as("sh"))
    val sizes = docs.select(col("doc_id"), size(col("sh")).cast("long").as("n_sh"))
    val inv = docs.select(col("doc_id"), explode(col("sh")).as("shingle"))
    val a = inv.as("a"); val b = inv.as("b")
    val inter = a.join(b,
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
      .withColumn("jaccard",
        col("n_inter").cast("double") /
          (col("n_a") + col("n_b") - col("n_inter")).cast("double"))
      .filter(col("jaccard") >= 0.5)
      .select(col("doc_a"), col("doc_b"), col("n_inter"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  val ngramJaccardSql: String =
    """WITH sh AS (
      |  SELECT doc_id, unnest(list_distinct(list_transform(
      |    generate_series(1, length(text) - 4),
      |    i -> substring(text, i, 5)))) AS shingle
      |  FROM documents
      |  WHERE length(text) >= 5
      |), sizes AS (
      |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh FROM sh GROUP BY doc_id
      |), inter AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |         CAST(COUNT(*) AS BIGINT) AS n_inter
      |  FROM sh a JOIN sh b
      |    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  GROUP BY a.doc_id, b.doc_id
      |)
      |SELECT i.doc_a, i.doc_b, i.n_inter,
      |  CAST(i.n_inter AS DOUBLE)
      |    / CAST(sa.n_sh + sb.n_sh - i.n_inter AS DOUBLE) AS jaccard
      |FROM inter i
      |JOIN sizes sa ON i.doc_a = sa.doc_id
      |JOIN sizes sb ON i.doc_b = sb.doc_id
      |WHERE CAST(i.n_inter AS DOUBLE)
      |    / CAST(sa.n_sh + sb.n_sh - i.n_inter AS DOUBLE) >= 0.5
      |ORDER BY doc_a, doc_b""".stripMargin

  /** MinHash signature term: min over shingles of md5(seed‖'|'‖shingle).
    * md5 is stable across engines, so even the LSH path is
    * oracle-checkable — unusual but deliberate (SURVEY.md §5).
    */
  private def minhashTerm(sh: Column, seed: Int): Column =
    array_min(transform(sh, s => md5(concat(lit(seed.toString), lit("|"), s))))

  /** MinHash-LSH candidate near-dup pairs: 8 hashes, 4 bands × 2 rows.
    * A pair is a candidate iff some band's 2-hash slice matches exactly.
    * Output: candidate pairs with their (exact) band match count —
    * at scale you then verify candidates with ngramJaccard on the
    * (tiny) candidate set only.
    */
  def minhashLsh(spark: SparkSession, sfDir: String): DataFrame = {
    val n = 5
    val nHashes = 8
    val rowsPerBand = 2
    val docs = Tables.documents(spark, sfDir)
      .filter(length(col("text")) >= n)
      .select(col("doc_id"), shingles(col("text"), n).as("sh"))
    val sig = docs.select(
      col("doc_id") +:
        (0 until nHashes).map(i => minhashTerm(col("sh"), i).as(s"h$i")): _*)
    // One pass over sig: each row fans out to its band buckets via
    // explode (band index is baked into the bucket hash input, so buckets
    // from different bands cannot collide).
    val bandCols = (0 until nHashes / rowsPerBand).map { b =>
      md5(concat_ws("|",
        (lit(b.toString) +:
          (0 until rowsPerBand).map(r => col(s"h${b * rowsPerBand + r}"))): _*))
    }
    val bands = sig.select(col("doc_id"), explode(array(bandCols: _*)).as("bucket"))
    val l = bands.as("l"); val r = bands.as("r")
    l.join(r, col("l.bucket") === col("r.bucket") && col("l.doc_id") < col("r.doc_id"))
      .groupBy(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_bands"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  val minhashLshSql: String = {
    val terms = (0 until 8).map(i =>
      s"list_min(list_transform(sh, s -> md5('$i' || '|' || s))) AS h$i").mkString(",\n      ")
    val bandRows = (0 until 4).map(b =>
      s"SELECT doc_id, md5('$b' || '|' || h${2 * b} || '|' || h${2 * b + 1}) AS bucket FROM sig")
      .mkString("\n  UNION ALL\n  ")
    s"""WITH docs AS (
       |  SELECT doc_id,
       |    list_distinct(list_transform(
       |      generate_series(1, greatest(length(text) - 4, 0)),
       |      i -> substring(text, i, 5))) AS sh
       |  FROM documents
       |  WHERE length(text) >= 5
       |), sig AS (
       |  SELECT doc_id,
       |      $terms
       |  FROM docs
       |), bands AS (
       |  $bandRows
       |)
       |SELECT l.doc_id AS doc_a, r.doc_id AS doc_b,
       |  CAST(COUNT(*) AS BIGINT) AS n_bands
       |FROM bands l JOIN bands r
       |  ON l.bucket = r.bucket AND l.doc_id < r.doc_id
       |GROUP BY l.doc_id, r.doc_id
       |ORDER BY doc_a, doc_b""".stripMargin
  }
}
