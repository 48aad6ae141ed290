package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.Tables
import graft.operators.Layout

/** LOSSLESS FILE-FORMAT ROUND-TRIP — the ingestion surface a 100 TB
  * pipeline lives on. The engine's HTTP sources prove the reference's
  * CSV/JSON wire mechanics (CsvHttpSource, PaginatedJsonSource —
  * reference main.py:63-137); THIS gate proves the dataset-grain file
  * formats a lake actually stores: every row written through CSV, then
  * JSONL, then ORC, and read back — three encode/decode generations —
  * must survive BIT-IDENTICALLY, across exactly the content that breaks
  * naive format handling:
  *
  *   - embedded record delimiters (LF and CR inside a quoted CSV field),
  *   - the quote character itself (RFC 4180 `""` doubling — the writer
  *     is pinned to `escape="` because Spark's DEFAULT backslash escape
  *     is a Spark-ism most external readers reject),
  *   - the column delimiter, tabs, and backslashes (the JSON escape
  *     char — a backslash that survives CSV but breaks sloppy JSON
  *     encoding is the classic double-unescape bug),
  *   - non-ASCII including an astral-plane code point (😀 forces
  *     surrogate-pair handling in every UTF-16 engine and 4-byte UTF-8
  *     on disk),
  *   - NULL vs EMPTY STRING as DISTINCT values — the canonical CSV data
  *     loss: the default Spark CSV round-trip folds '' into null. The
  *     writer/reader pin `nullValue="\N"` (the classic dump sentinel)
  *     and `emptyValue=""""` so the distinction survives; the gated
  *     n_nulls / n_empty columns make any fold a hash mismatch,
  *   - LEADING/TRAILING whitespace and ≤0x20 control characters — the
  *     second silent default loss: Spark's CSV WRITER trims them
  *     (`ignore*WhiteSpace` default TRUE on write, Java `String.trim`
  *     semantics) before quoting is even considered, so a trailing
  *     newline or tab vanishes with no error. Both options are pinned
  *     false on both sides, the armor starts with a space and ends
  *     with tab+space, and the spec's adversarial battery (NUL, BEL,
  *     ESC, BOM, bidi override, combining marks, ZWJ/ZWSP, edge
  *     CR/LF/CRLF/tabs/spaces) proves the only residual divergence in
  *     any format generation is the declared `\N` sentinel fold.
  *
  * The payload is DERIVED deterministically from the documents corpus
  * (doc_id-mod case ladder over transformed text — no synthesized
  * inputs), and the SAME derivation runs in the oracle engine directly
  * against the base table: the oracle never sees the staged files, so
  * the only way the hashes match is if the triple round-trip was the
  * identity. Gated surface: per-source row/null/empty counts, a
  * code-point length sum, and the order-invariant 56-bit-md5-sum
  * checksum (the q_table_checksum pattern, DECIMAL(38,0) rendered as a
  * string — engine-portable at any magnitude).
  *
  * Scale shape: writers and readers are the stock distributed
  * DataFrame sinks/sources — per-partition encode/decode, no driver
  * paths; the staged copy lives on tmpfs for the suite (Layout
  * .withStagedDir). At 100 TB this IS the production read/write path;
  * the gate's value is pinning the OPTION SET that makes it lossless.
  * Known format limit, documented not hidden: CSV null-vs-content is
  * sentinel-based, so a payload equal to the sentinel `\N` would read
  * back null — the derivation never emits it, and formats with typed
  * null (JSONL, ORC, parquet) carry no such caveat.
  */
object FileFormats {

  /** The adversarial payload, one expression used by BOTH engines:
    * doc_id % 11 = 0 → NULL; = 1 → '' (empty, distinct from null);
    * otherwise delimiter/quote/escape/unicode armor around the doc's
    * own text prefix. Keep [[hardenedPayloadSql]] in lockstep. */
  private[graft] def hardenedPayload: Column =
    when(col("doc_id") % 11 === 0, lit(null).cast("string"))
      .when(col("doc_id") % 11 === 1, lit(""))
      .otherwise(concat(
        lit(" \"q\",\n\tté¥😀\\|"),
        // strip backslashes from the embedded corpus text (both engine
        // sides, r14 ADVICE): the "never emits the `\N` sentinel"
        // guarantee is then structural, not data-dependent — a future
        // corpus containing literal '\N' can no longer fold to NULL in
        // the CSV generation. No-op on the current corpus (0 backslash
        // rows at sf0.1), so gated hashes are unchanged.
        translate(substring(col("text"), 1, 40), "\\", ""),
        lit("\r;'"),
        col("doc_id").cast("string"),
        lit("\t "))) // leading/trailing whitespace: the writer-trim class

  private[graft] val hardenedPayloadSql: String =
    "CASE WHEN doc_id % 11 = 0 THEN NULL WHEN doc_id % 11 = 1 THEN '' " +
      "ELSE ' \"q\",' || chr(10) || chr(9) || 'té¥😀\\|' || " +
      "replace(substring(text, 1, 40), chr(92), '') || chr(13) || ';''' || " +
      "CAST(doc_id AS VARCHAR) || chr(9) || ' ' END"

  private[graft] def hardenedDocs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), hardenedPayload.as("payload"))

  private val roundtripSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("source", StringType),
    StructField("payload", StringType)))

  /** CSV write+read with the loss-proof option set (RFC 4180 quote
    * doubling, multiLine quoted-newline parsing, explicit null sentinel
    * vs quoted-empty so ''/null stay distinct). */
  private[graft] def throughCsv(spark: SparkSession, df: DataFrame, dir: String): DataFrame = {
    df.write.mode("overwrite")
      .option("header", "true")
      .option("escape", "\"")
      .option("nullValue", "\\N")
      .option("emptyValue", "\"\"")
      // the WRITER trims by default (ignore*WhiteSpace default TRUE on
      // write, and the trim is Java String.trim semantics — every char
      // ≤ 0x20, so trailing newlines/tabs/control chars silently vanish
      // before quoting is even considered; caught by the adversarial
      // battery in FileFormatsSpec, invisible to digit-suffixed armor)
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(dir)
    spark.read.schema(roundtripSchema)
      .option("header", "true")
      .option("multiLine", "true")
      .option("escape", "\"")
      .option("nullValue", "\\N")
      .option("emptyValue", "")
      .option("ignoreLeadingWhiteSpace", "false") // read defaults are
      .option("ignoreTrailingWhiteSpace", "false") // false; pin anyway
      .csv(dir)
  }

  /** JSONL write+read: typed null and \-escapes are native; the schema
    * is pinned on read so a column of all-null rows cannot vanish. */
  private[graft] def throughJsonl(spark: SparkSession, df: DataFrame, dir: String): DataFrame = {
    df.write.mode("overwrite").json(dir)
    spark.read.schema(roundtripSchema).json(dir)
  }

  private[graft] def throughOrc(spark: SparkSession, df: DataFrame, dir: String): DataFrame = {
    df.write.mode("overwrite").orc(dir)
    spark.read.schema(roundtripSchema).orc(dir)
  }

  /** All three format generations, CSV → JSONL → ORC: each reads what
    * the previous one survived, so one gate covers every encoder and
    * decoder in the chain. */
  private[graft] def tripleRoundtrip(spark: SparkSession, sfDir: String): DataFrame =
    Layout.withStagedDir(spark, "graft-fmt-csv") { csvDir =>
      Layout.withStagedDir(spark, "graft-fmt-json") { jsonDir =>
        Layout.withStagedDir(spark, "graft-fmt-orc") { orcDir =>
          val viaCsv = throughCsv(spark, hardenedDocs(spark, sfDir), csvDir)
          val viaJson = throughJsonl(spark, viaCsv, jsonDir)
          val viaOrc = throughOrc(spark, viaJson, orcDir)
          // the staged dirs are deleted when these scopes close, so the
          // final generation must be off-file before returning
          val out = viaOrc.localCheckpoint(true)
          out
        }
      }
    }

  /** 56-bit order-invariant row hash of (payload, doc_id) — the
    * q_table_checksum pattern (GovernanceOps.scala:468); the coalesce
    * sentinel U+2400 keeps null ≠ '' ≠ absent in the hash preimage. */
  private def payloadHash: Column =
    conv(substring(md5(concat(
      coalesce(col("payload"), lit("␀")), lit("|"),
      col("doc_id").cast("string"))), 1, 14), 16, 10).cast("long")

  private def gateAgg(rows: DataFrame): DataFrame =
    rows.groupBy(col("source"))
      .agg(
        count(lit(1)).cast("long").as("n_rows"),
        sum(when(col("payload").isNull, 1L).otherwise(0L)).cast("long").as("n_nulls"),
        sum(when(col("payload") === "", 1L).otherwise(0L)).cast("long").as("n_empty"),
        sum(when(col("payload").isNotNull, length(col("payload"))).otherwise(0L))
          .cast("long").as("len_sum"),
        sum(payloadHash.cast("decimal(38,0)")).cast("decimal(38,0)")
          .cast("string").as("payload_checksum"))
      .orderBy(col("source"))

  def formatRoundtrip(spark: SparkSession, sfDir: String): DataFrame =
    gateAgg(tripleRoundtrip(spark, sfDir))

  /** SCHEMA EVOLUTION under mergeSchema — the lake-mechanics gate for
    * the drift every long-lived dataset accumulates: generation 1 is
    * written WITHOUT the `quality` column, generation 2 adds it, and a
    * single merged read must serve both — old files surfacing a typed
    * NULL for the column they never carried, new files carrying their
    * values, with nothing dropped, duplicated, or coerced. The split
    * and the added column are derived deterministically from the
    * documents table (doc_id parity; quality = n_chars % 100), and the
    * oracle replays the same derivation with an explicit NULL for the
    * old generation — so the gate pins Spark's parquet schema-merge
    * semantics (footer union, by-name reconciliation, null back-fill)
    * against a file-free recompute.
    *
    * Scale note: `mergeSchema` unions footers at planning time — cost
    * scales with FILE COUNT, not data; a 100 TB lake amortizes it by
    * pinning the merged schema in a catalog after one inference pass.
    * The read path itself (per-file projection with missing-column
    * null fill) is the stock vectorized reader either way.
    */
  def schemaEvolution(spark: SparkSession, sfDir: String): DataFrame =
    Layout.withStagedDir(spark, "graft-schema-evo") { dir =>
      val docs = Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("source"), col("n_chars"))
      docs.filter(col("doc_id") % 2 === 0)
        .write.mode("overwrite").parquet(s"$dir/gen1")
      docs.filter(col("doc_id") % 2 =!= 0)
        .withColumn("quality", (col("n_chars") % 100).cast("long"))
        .write.mode("overwrite").parquet(s"$dir/gen2")
      val merged = spark.read.option("mergeSchema", "true")
        .parquet(s"$dir/gen1", s"$dir/gen2")
      merged.groupBy(col("source"))
        .agg(count(lit(1)).cast("long").as("n_rows"),
          sum(when(col("quality").isNull, 1L).otherwise(0L))
            .cast("long").as("n_legacy"),
          sum(coalesce(col("quality"), lit(0L))).cast("long").as("quality_sum"),
          sum(col("n_chars")).cast("long").as("chars_sum"))
        .orderBy(col("source"))
        .localCheckpoint(true) // off-file before the staged dir deletes
    }

  val schemaEvolutionSql: String =
    """WITH m AS (
      |  SELECT doc_id, source, n_chars, CAST(NULL AS BIGINT) AS quality
      |  FROM documents WHERE doc_id % 2 = 0
      |  UNION ALL
      |  SELECT doc_id, source, n_chars, CAST(n_chars % 100 AS BIGINT) AS quality
      |  FROM documents WHERE doc_id % 2 <> 0
      |)
      |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(SUM(CASE WHEN quality IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_legacy,
      |  CAST(SUM(COALESCE(quality, 0)) AS BIGINT) AS quality_sum,
      |  CAST(SUM(n_chars) AS BIGINT) AS chars_sum
      |FROM m GROUP BY source ORDER BY source""".stripMargin

  /** Oracle: the same aggregates over the same derivation, straight off
    * the base table — files never enter; identity is the only way to
    * match. */
  val formatRoundtripSql: String =
    s"""WITH h AS (
       |  SELECT doc_id, source, $hardenedPayloadSql AS payload FROM documents
       |)
       |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_rows,
       |  CAST(SUM(CASE WHEN payload IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       |  CAST(SUM(CASE WHEN payload = '' THEN 1 ELSE 0 END) AS BIGINT) AS n_empty,
       |  CAST(SUM(CASE WHEN payload IS NOT NULL THEN length(payload) ELSE 0 END) AS BIGINT) AS len_sum,
       |  CAST(CAST(SUM(CAST(CAST(CONCAT('0x', substring(md5(
       |    COALESCE(payload, '␀') || '|' || CAST(doc_id AS VARCHAR)
       |  ), 1, 14)) AS BIGINT) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS VARCHAR) AS payload_checksum
       |FROM h GROUP BY source ORDER BY source""".stripMargin
}
