package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import Materialize.CorpusSyntax

/** Training-data curation operators: deterministic stratified sampling
  * (data mixing), concat-and-chunk sequence packing, and PII scrubbing
  * — the steps between "deduped corpus" and "training batches".
  *
  * Scale notes:
  *  - Sampling is a row-local hash predicate — no shuffle, no RNG
  *    state, reproducible on any cluster layout, and resample-stable
  *    (changing one stratum's rate doesn't reshuffle the others).
  *  - Packing as implemented uses one global ordered window (fine to
  *    ~10⁷ docs); the 100 TB form is identical math over a two-pass
  *    distributed prefix sum: per-partition token totals → exclusive
  *    scan on the driver (one row per partition) → broadcast offsets.
  *  - Scrubbing is row-local regexp work that pipelines in the scan
  *    stage; patterns are RE2-safe so the oracle matches byte-for-byte.
  */
object CurationOps {

  /** Deterministic stratified sampling by language: keep a doc when
    * md5(doc_id)'s first 32 bits mod 100 falls under its stratum's
    * keep-rate (en 50%, others 20%) — hash-based quota mixing.
    */
  def sampleStratified(spark: SparkSession, sfDir: String): DataFrame =
    stratifiedFilter(Tables.documents(spark, sfDir))
      .select(col("doc_id"), col("lang"), col("bucket"))
      .orderBy(col("doc_id"))

  /** Documents kept per source under [[domainCaps]] — sized BELOW the
    * testdata's uniform 25-per-source (sf0.01) so the cap genuinely
    * binds at every scale (the MgCapacity discipline). */
  private[graft] val DomainCap = 15

  /** PER-DOMAIN DOCUMENT CAPS — the anti-spam curation stage every
    * web-scale pipeline runs (a handful of boilerplate-heavy domains
    * otherwise dominate the corpus): within each source, rank documents
    * by a quality signal (here n_chars desc — length heuristics are a
    * standard first-pass gate — with doc_id as the deterministic
    * tiebreak) and keep the top [[DomainCap]].
    *
    * Scale shape: Spark 3.5+'s WindowGroupLimit inserts a PRE-SHUFFLE
    * rank filter, so each mapper forwards at most cap rows per source
    * it touches — the exchange carries ≤ mappers·cap rows per domain
    * and the final per-source partition is bounded the same way,
    * REGARDLESS of how many billion documents a spam domain holds.
    * That bound is exactly why caps rank by a cheap row-local signal:
    * the stage must be runnable before any expensive scoring. Scan
    * prunes to the three output columns.
    */
  def domainCaps(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(col("n_chars").desc, col("doc_id"))
    Tables.documents(spark, sfDir)
      .select(col("source"), col("doc_id"), col("n_chars"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= DomainCap)
      .orderBy(col("source"), col("rk"))
  }

  val domainCapsSql: String =
    s"""SELECT source, doc_id, n_chars, rk FROM (
       |  SELECT source, doc_id, n_chars,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY source
       |      ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rk
       |  FROM documents)
       |WHERE rk <= $DomainCap
       |ORDER BY source, rk""".stripMargin

  /** The CURATION LIFECYCLE under the oracle — lifecycle #7, extending
    * the stream ≡ batch family (events / search / ANN / IVF×PQ / media
    * / dedup) to the curation flow itself: the EVEN doc_ids are
    * batch-curated (content-hash dedup → PII scrub → quality gate)
    * into an epoch table, the ODD doc_ids stream through the REAL
    * Structured Streaming curation
    * ([[graft.streaming.DocStream.appendCuratedStream]] —
    * dropDuplicatesWithinWatermark state, per-batch epoch resolve,
    * appends into the SAME table), and the gated output is the
    * survivor-invariant DISTINCT (key_hash, scrubbed_md5,
    * quality_cents) projection of the union. The oracle is the batch
    * one-pass form of the same three stages over the whole corpus, so
    * the driver hash-match proves the streamed curation state machine
    * ≡ batch (DocStreamSpec proves it in-process; this key puts the
    * claim in the per-round driver gate).
    *
    * Determinism design: a cross-half duplicate lands one row from
    * each write path, and a within-stream duplicate's survivor depends
    * on replay order — both are absorbed because every same-key row is
    * VALUE-IDENTICAL under full-content keying (see
    * curateDocStreamContent's scaladoc), making DISTINCT order-free.
    * Arrival ts is synthesized as base + doc_id seconds; the 365-day
    * watermark delay covers any replay disorder of that span, so no
    * dedup state ever evicts mid-replay (the events-lifecycle rule).
    * No sentinel drain is needed: dropDuplicatesWithinWatermark is a
    * filter, not an aggregation — survivors emit in their own arrival
    * batch. Rotates a fresh epoch every call and prunes to two.
    */
  def curationLifecycle(spark: SparkSession, sfDir: String): DataFrame = {
    val base = "graft_cur_lc_" + Layout.corpusTag(sfDir)
    val docs = Tables.documentsFanned(spark, sfDir)
      .select(col("doc_id"), col("text"))
    def curatedBatch(half: DataFrame): DataFrame =
      half.select(md5(col("text")).as("key_hash"),
          scrubbedText(col("text")).as("text"))
        .withColumn("scrubbed_md5", md5(col("text")))
        .withColumn("quality_cents",
          TextOps.classifierMarginCents(col("text")))
        .filter(col("quality_cents") >= 0L)
        .select(col("key_hash"), col("scrubbed_md5"), col("quality_cents"))
    val t = Layout.rotateEpoch(spark, base) { name =>
      curatedBatch(docs.filter(col("doc_id") % 2 === 0))
        .write.format("parquet").mode("overwrite").saveAsTable(name)
    }
    val oddIds = docs.filter(col("doc_id") % 2 =!= 0)
    val odd = oddIds.select(col("text"),
      (lit(1767225600L) + col("doc_id")).cast("timestamp").as("ts"))
    // The watermark delay must cover the replayed rows' FULL ts span or
    // dropDuplicatesWithinWatermark silently discards late arrivals
    // under out-of-order file replay (the eventsLifecycle rule; a fixed
    // 365-day delay broke on the 10x stress corpus, whose
    // doc_id-derived span is ~2.9 years). Derive it from the actual
    // span — one cheap 2-long aggregate — so ANY corpus replays
    // loss-free.
    val span = oddIds
      .agg(min(col("doc_id")).as("lo"), max(col("doc_id")).as("hi")).head()
    val delaySec =
      if (span.isNullAt(0)) 86400L
      else span.getLong(1) - span.getLong(0) + 86400L
    Layout.replayAsStream(odd, "graft-curlc") { stream =>
      graft.streaming.DocStream.appendCuratedStream(
        stream, base, watermark = s"$delaySec seconds")
    }
    Layout.pruneEpochs(spark, base, keep = 2)
    spark.table(t)
      .select(col("key_hash"), col("scrubbed_md5"), col("quality_cents"))
      .distinct()
      .orderBy(col("key_hash"))
  }

  /** Oracle: the one-pass batch form of the same three stages —
    * content-distinct, scrub, integer-cents quality gate (weights ×100
    * as exact ints, the qualityClassifierSql vocabulary). */
  val curationLifecycleSql: String =
    """WITH s AS (
      |  SELECT doc_id, md5(text) AS key_hash,
      |    regexp_replace(regexp_replace(text,
      |      '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
      |      '[0-9]{7,}', '<NUM>', 'g') AS scrubbed
      |  FROM documents),
      |v(token, w100) AS (VALUES
      |  ('spark', 80), ('query', 45), ('fast', 60), ('window', 35),
      |  ('join', 30), ('hash', 25), ('slow', -70), ('the', -25),
      |  ('a', -20), ('row', -10)),
      |tok AS (
      |  SELECT doc_id, unnest(list_filter(
      |    string_split_regex(lower(scrubbed), '[^a-z0-9]+'), x -> x <> '')) AS token
      |  FROM s),
      |z AS (
      |  SELECT t.doc_id, CAST(SUM(v.w100) AS BIGINT) AS zc
      |  FROM tok t JOIN v USING (token) GROUP BY 1),
      |m AS (
      |  SELECT s.key_hash, md5(s.scrubbed) AS scrubbed_md5,
      |    COALESCE(z.zc, 0) - 150 AS quality_cents
      |  FROM s LEFT JOIN z USING (doc_id))
      |SELECT DISTINCT key_hash, scrubbed_md5,
      |  CAST(quality_cents AS BIGINT) AS quality_cents
      |FROM m WHERE quality_cents >= 0
      |ORDER BY key_hash""".stripMargin

  /** First-32-bits-of-md5 bucket in [0, 100) — THE deterministic keep
    * predicate, shared by stratified sampling, cluster balancing, and
    * the group-keyed train/val split (their oracles hard-code the same
    * formula); one definition so the copies can never de-synchronize. */
  private[graft] def md5Bucket(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 8), 16, 10).cast("long") % 100

  /** Library core: rows of `docs` surviving the hash-quota mix, with
    * their `bucket` attached — all original columns preserved so the
    * filter composes mid-pipeline. */
  def stratifiedFilter(docs: DataFrame): DataFrame = {
    val bucket = md5Bucket(col("doc_id"))
    val rate = when(col("lang") === "en", 50L).otherwise(20L)
    docs.withColumn("bucket", bucket).filter(col("bucket") < rate)
  }

  val sampleStratifiedSql: String =
    """SELECT doc_id, lang,
      |  CAST(CONCAT('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS bucket
      |FROM documents
      |WHERE CAST(CONCAT('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100
      |  < (CASE WHEN lang = 'en' THEN 50 ELSE 20 END)
      |ORDER BY doc_id""".stripMargin

  /** Concat-and-chunk sequence packing (the GPT-style pretraining
    * layout): documents concatenate in doc_id order into one token
    * stream chunked into fixed 2048-token sequences; each doc gets the
    * bin its FIRST token lands in plus its offset there. Token count =
    * whitespace-ish tokens (TextOps.tokens).
    *
    * The global prefix sum is a **two-pass distributed scan**, never a
    * single global window (a `Window.orderBy` with no partitionBy drags
    * the whole corpus to ONE partition — an OOM at scale):
    *
    *  1. docs bucket into fixed doc_id ranges (`chunk = doc_id div W`,
    *     ≤ W docs per chunk by construction, so no skew); per-chunk
    *     token totals aggregate distributed (map-side partial agg) and
    *     collect to the driver — ONE small row per chunk, ~n/W rows
    *     (at 10⁹ docs and W=4096 that is ~250K rows ≈ a few MB).
    *  2. the driver runs the exclusive scan over chunk totals (trivial
    *     sequential loop), the resulting per-chunk stream offsets
    *     broadcast-join back, and the within-chunk prefix sum is a
    *     `Window.partitionBy(chunk).orderBy(doc_id)` — fully parallel,
    *     bounded partitions.
    *
    * stream_start = chunk_offset + within-chunk prefix. Identical math
    * to the naive global window; the oracle is unchanged.
    */
  def packSequences(spark: SparkSession, sfDir: String): DataFrame =
    packSequencesFor(Tables.documentsFanned(spark, sfDir))

  /** Library core: packing for any (doc_id, text, …) frame. */
  def packSequencesFor(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val budget = 2048L
    val chunkWidth = 4096L
    // (doc_id, n_tokens, chunk) is three longs/row — cache (lazily) so the
    // totals pass and the final pass don't both re-tokenize the corpus.
    // persist, NOT localCheckpoint: checkpoint materializes with an extra
    // eager job, while the pass-1 collect below populates this cache as a
    // side effect of work it does anyway (2.5 s → ~1 s at sf0.1).
    // The cache is deliberately NOT unpersisted here: the returned frame
    // still reads it (an unpersist at function exit would force pass 2 to
    // re-tokenize, undoing the optimization). Once the caller drops the
    // returned frame, ContextCleaner reclaims the blocks (three longs/row,
    // so even a 10⁹-doc corpus caches ~24 GB cluster-wide, transiently).
    val toks = docs
      .select(col("doc_id"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("chunk", expr(s"doc_id div $chunkWidth"))
      .persist()
    // Pass 1: per-chunk totals → driver-side exclusive scan.
    val totals = toks.groupBy(col("chunk")).agg(sum(col("n_tokens")).as("tot"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val exclusive = totals.map { case (chunk, tot) =>
      val off = acc; acc += tot; (chunk, off)
    }
    val offsetsDf = spark.createDataFrame(exclusive.toSeq)
      .toDF("chunk", "chunk_offset")
    // Pass 2: within-chunk prefix sum (partitioned window) + broadcast
    // chunk offsets.
    val withinChunk = Window.partitionBy(col("chunk")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    toks.join(broadcast(offsetsDf), "chunk")
      .withColumn("stream_start",
        col("chunk_offset") + sum(col("n_tokens")).over(withinChunk) - col("n_tokens"))
      .select(col("doc_id"), col("n_tokens"),
        // integer `div`, not `/` + cast: double division loses exactness
        // above 2^53 (same rule as the nanos floor in Tables.scala)
        expr(s"stream_start div $budget").as("bin_id"),
        (col("stream_start") % budget).as("bin_offset"))
      .orderBy(col("doc_id"))
  }

  val packSequencesSql: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    CAST(len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
      |      x -> x <> '')) AS BIGINT) AS n_tokens
      |  FROM documents
      |), s AS (
      |  SELECT doc_id, n_tokens,
      |    SUM(n_tokens) OVER (ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS stream_start
      |  FROM t)
      |SELECT doc_id, n_tokens,
      |  CAST(stream_start // 2048 AS BIGINT) AS bin_id,
      |  -- CAST matters: DuckDB's window SUM(BIGINT) widens to HUGEINT, so
      |  -- without it bin_offset hashes as HUGEINT vs Spark's BIGINT
      |  CAST(stream_start % 2048 AS BIGINT) AS bin_offset
      |FROM s
      |ORDER BY doc_id""".stripMargin

  /** Domain-mixture planning — the step that decides HOW MUCH of each
    * source/domain the training run samples (the multilingual/domain
    * temperature-sampling scheme, α = 0.5: share_i ∝ n_i^α flattens the
    * natural distribution toward the tail without inverting it). Given
    * a token budget of half the corpus, each source gets
    * rate_i = min(1, budget·share_i / n_i) — the per-source Bernoulli
    * keep-rate that [[sampleStratified]]'s hash predicate then executes.
    *
    * Scale shape: one partial-agg shuffle to the per-source frame
    * (#sources rows), a 1-row total aggregate broadcast back over it —
    * the plan never reshuffles the corpus. `sqrt` is IEEE
    * correctly-rounded in both engines; only the share/rate division
    * rides `round(·, 6)`.
    */
  def mixturePlan(spark: SparkSession, sfDir: String): DataFrame =
    mixturePlanFor(
      Tables.documentsFanned(spark, sfDir).select(col("source"), col("text")))

  /** Library core of [[mixturePlan]] for any (source, text) frame. */
  def mixturePlanFor(docs: DataFrame): DataFrame = {
    val perSrc = docs
      .select(col("source"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_tok"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
    val tot = perSrc.agg(
      sum(sqrt(col("n_tokens").cast("double"))).as("w_sum"),
      sum(col("n_tokens")).cast("double").as("tok_sum"))
    val w = sqrt(col("n_tokens").cast("double"))
    perSrc.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        // a zero-token source has nothing to sample: share and rate pin
        // to 0 rather than evaluating 0/0 (NaN in Spark,
        // engine-dependent in the oracle — the one value the compare
        // can't line up). n_tokens > 0 implies w_sum > 0 (this source's
        // own sqrt contributes), so one guard covers both divisions.
        when(col("n_tokens") > 0, round(w / col("w_sum"), 6))
          .otherwise(lit(0.0)).as("share"),
        when(col("n_tokens") > 0,
          round(least(lit(1.0),
            lit(0.5) * col("tok_sum") * (w / col("w_sum"))
              / col("n_tokens").cast("double")), 6))
          .otherwise(lit(0.0)).as("rate"))
      .orderBy(col("source"))
  }

  val mixturePlanSql: String =
    """WITH per_src AS (
      |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |    CAST(SUM(CAST(len(list_filter(
      |      string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> ''))
      |      AS BIGINT)) AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY source
      |), tot AS (
      |  SELECT SUM(SQRT(CAST(n_tokens AS DOUBLE))) AS w_sum,
      |    CAST(SUM(n_tokens) AS DOUBLE) AS tok_sum
      |  FROM per_src
      |)
      |SELECT source, n_docs, n_tokens,
      |  CASE WHEN n_tokens > 0 THEN
      |    ROUND(SQRT(CAST(n_tokens AS DOUBLE)) / w_sum, 6)
      |  ELSE 0.0 END AS share,
      |  CASE WHEN n_tokens > 0 THEN
      |    ROUND(LEAST(1.0, 0.5 * tok_sum * (SQRT(CAST(n_tokens AS DOUBLE)) / w_sum)
      |      / CAST(n_tokens AS DOUBLE)), 6)
      |  ELSE 0.0 END AS rate
      |FROM per_src CROSS JOIN tot
      |ORDER BY source""".stripMargin

  /** Sliding-window chunking — the pre-tokenization step that turns
    * variable-length documents into bounded training windows: chunks of
    * at most [[ChunkMaxTokens]] tokens starting every [[ChunkStride]]
    * tokens (overlap = max − stride preserves cross-boundary context).
    * Emits the materialized chunk text, not just offsets.
    *
    * Window starts run 0, stride, 2·stride, … up to the SMALLEST start
    * whose window reaches the document end (the HF-tokenizer
    * `return_overflowing_tokens` convention) — so no chunk is ever
    * fully contained in its predecessor, every non-last chunk is
    * exactly full-size, and concatenating chunks minus each successor's
    * `overlap` prefix reconstructs the token stream exactly
    * (spec-asserted).
    *
    * Scale shape: entirely row-local — tokenize once, `posexplode` the
    * bounded `sequence` of window starts, `slice` the token array per
    * start. Zero shuffles before the output sort; chunk explosion is
    * bounded (≤ n/stride + 1 rows per doc) and pipelines inside the
    * scan stage, so at 100 TB this is a pure map over the corpus with
    * output ~(1 + overlap/stride)× input tokens.
    */
  private[graft] val ChunkMaxTokens = 64
  private[graft] val ChunkStride = 48

  def chunkDocs(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = TextOps.tokens(col("text"))
    Tables.documentsFanned(spark, sfDir)
      .select(col("doc_id"), toks.as("toks"), size(toks).as("n"))
      .select(col("doc_id"), col("toks"), col("n"),
        // last start = smallest multiple of stride whose window covers
        // the tail: greatest(0, ceil((n - max)/stride)·stride), written
        // as a floor so Spark and DuckDB round negatives identically
        posexplode(when(col("n") > 0,
          sequence(lit(0),
            greatest(lit(0),
              (floor((col("n") - lit(ChunkMaxTokens - ChunkStride + 1))
                / lit(ChunkStride.toDouble)) * ChunkStride).cast("int")),
            lit(ChunkStride)))
          .otherwise(array())))
      .select(
        col("doc_id"),
        col("pos").cast("long").as("chunk_id"),
        least(lit(ChunkMaxTokens), col("n") - col("col")).cast("long")
          .as("n_chunk_tokens"),
        concat_ws(" ", slice(col("toks"), col("col") + 1, lit(ChunkMaxTokens)))
          .as("chunk_text"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  val chunkDocsSql: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
      |      x -> x <> '') AS toks
      |  FROM documents
      |), s AS (
      |  SELECT doc_id, toks, len(toks) AS n,
      |    unnest(CASE WHEN len(toks) > 0
      |      THEN generate_series(0, greatest(0, ((len(toks) - 17) // 48) * 48), 48)
      |      ELSE [] END) AS start
      |  FROM t)
      |SELECT doc_id,
      |  CAST(start // 48 AS BIGINT) AS chunk_id,
      |  CAST(least(64, n - start) AS BIGINT) AS n_chunk_tokens,
      |  array_to_string(list_slice(toks, start + 1, least(start + 64, n)),
      |    ' ') AS chunk_text
      |FROM s
      |ORDER BY doc_id, chunk_id""".stripMargin

  /** Benchmark decontamination — the train/test-overlap check a
    * pretraining pipeline runs before shipping data: flag every corpus
    * document sharing at least one 13-char shingle with the benchmark
    * set (the n-gram-collision method used for GPT-style training-set
    * decontamination; 13 chars stands in for the usual 13 tokens at
    * this corpus's scale). The benchmark here is a deterministic
    * stand-in slice (doc_id ≡ 0 mod 50) so the oracle can reproduce it.
    *
    * Scale shape: the BENCHMARK side is small by nature (evaluation
    * sets are thousands of documents, the corpus is billions) — its
    * distinct shingle set broadcasts, and the corpus side is one
    * linear explode + broadcast semi-join + distinct, no shuffle of
    * document text and no quadratic anything. At 100 TB this is a
    * map-side filter over the corpus scan.
    */
  def decontaminate(spark: SparkSession, sfDir: String): DataFrame = {
    val n = 13
    val docs = Tables.documentsFanned(spark, sfDir)
      .filter(length(col("text")) >= n)
    val benchShingles = docs.filter(col("doc_id") % 50 === 0)
      .select(explode(DedupOps.shingles(col("text"), n)).as("sh"))
      .distinct()
    docs.filter(col("doc_id") % 50 =!= 0)
      .select(col("doc_id"), explode(DedupOps.shingles(col("text"), n)).as("sh"))
      .join(broadcast(benchShingles), Seq("sh"), "left_semi")
      .select(col("doc_id")).distinct()
      .orderBy(col("doc_id"))
  }

  val decontaminateSql: String =
    """WITH b AS (
      |  SELECT DISTINCT unnest(list_distinct(list_transform(
      |    generate_series(1, length(text) - 12), i -> substring(text, i, 13)))) AS sh
      |  FROM documents WHERE doc_id % 50 = 0 AND length(text) >= 13
      |), c AS (
      |  SELECT doc_id, unnest(list_distinct(list_transform(
      |    generate_series(1, length(text) - 12), i -> substring(text, i, 13)))) AS sh
      |  FROM documents WHERE doc_id % 50 <> 0 AND length(text) >= 13
      |)
      |SELECT DISTINCT c.doc_id FROM c JOIN b USING (sh)
      |ORDER BY doc_id""".stripMargin

  /** Bloom-filter bits (m = 2²⁰ → a 16384-long bitmap literal, 128 KB)
    * and probe count (k = 8) for [[decontaminateBloomGated]]. Sized for
    * the benchmark side: k·n/m ≈ 0.2 at sf0.1's ~28K benchmark
    * shingles → per-shingle fpp ≈ 2e-6, per-300-char-doc FP ≈ 5e-4 —
    * a couple of expected false docs per 5000 against the 5% gate. */
  private[graft] val BloomBits = 1 << 20
  private[graft] val BloomHashes = 8

  /** BLOOM-FILTER decontamination — the space-bounded form of
    * [[decontaminate]] a 100 TB pipeline actually ships: the benchmark
    * shingle SET (which [[decontaminate]] broadcasts whole) compresses
    * to an m-bit Bloom bitmap, and the corpus-side membership test
    * becomes k seeded-xxhash64 bit probes evaluated INSIDE whole-stage
    * codegen against the bitmap literal — no UDF, no broadcast table,
    * no join for candidate detection. Fully deterministic (seeded
    * hashes, fixed m/k), so the sketch's guarantees gate like the
    * HLL/KLL/MG trio: the hashed row carries the EXACT counts (oracle-
    * verified) plus two Spark-evaluated booleans — `superset_ok`
    * (Bloom NEVER misses a true contamination: structural, a benchmark
    * shingle's own bits are always set) and `fp_ok` (false-positive
    * docs within the 5%-of-clean-docs budget the m/k sizing promises).
    *
    * Scale shape: ONE corpus pass computes both detectors per shingle
    * (Bloom probes row-local; the exact twin rides the same explode
    * through the broadcast bench join), then per-doc flags fold in a
    * map-side-combined aggregate, then a 1-row summary. The build side
    * aggregates bit positions into ≤ m/64 words distributed (bit_or,
    * map-side combined) before the bounded driver collect — bounded by
    * m, not the benchmark size. In production the exact twin drops and
    * the operator is the Bloom probe alone: a 128 KB task-constant
    * filter replacing a benchmark-sized broadcast set.
    */
  def decontaminateBloomGated(spark: SparkSession, sfDir: String): DataFrame =
    bloomDecontamSummary(Tables.documentsFanned(spark, sfDir))

  /** Build the m-bit Bloom bitmap of a one-column `sh` frame as word
    * longs: the d seeded positions per item aggregate distributed
    * (bit_or, map-side combined) into ≤ m/64 word rows before the
    * bounded driver collect. Mergeable summary: the bitmap of a UNION
    * of shards is the bitwise OR of the shard bitmaps (set bits only
    * ever accumulate) — PropertySpec proves the law over random splits.
    */
  private[graft] def bloomBitmapOf(items: DataFrame): Array[Long] = {
    val (m, kH) = (BloomBits, BloomHashes)
    val pos = items.select(explode(array((0 until kH).map(i =>
      pmod(xxhash64(col("sh"), lit(i)), lit(m.toLong))): _*)).as("p"))
    val words = pos
      .select(shiftright(col("p"), 6).cast("int").as("wi"),
        call_function("shiftleft", lit(1L),
          col("p").bitwiseAND(lit(63L)).cast("int")).as("mask"))
      .groupBy(col("wi")).agg(bit_or(col("mask")).as("w"))
      .collect()
    val bitmap = new Array[Long](m / 64)
    words.foreach(r => bitmap(r.getInt(0)) = r.getLong(1))
    bitmap
  }

  /** Core of [[decontaminateBloomGated]] over an explicit (doc_id,
    * text) frame — planted-corpus specs drive this directly. */
  private[graft] def bloomDecontamSummary(docsIn: DataFrame): DataFrame = {
    val n = 13
    val (m, kH) = (BloomBits, BloomHashes)
    val docs = docsIn.filter(length(col("text")) >= n)
    val bench = docs.filter(col("doc_id") % 50 === 0)
      .select(explode(DedupOps.shingles(col("text"), n)).as("sh"))
      .distinct()
    val bitmap = bloomBitmapOf(bench)
    val bmLit = typedLit(bitmap.toSeq)
    def mightContain(c: Column): Column = (0 until kH).map { i =>
      val h = pmod(xxhash64(c, lit(i)), lit(m.toLong))
      call_function("shiftright",
          element_at(bmLit, shiftright(h, 6).cast("int") + 1),
          h.bitwiseAND(lit(63L)).cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
    val flags = docs.filter(col("doc_id") % 50 =!= 0)
      .select(col("doc_id"), explode(DedupOps.shingles(col("text"), n)).as("sh"))
      .join(broadcast(bench.withColumn("hit", lit(true))), Seq("sh"), "left")
      .select(col("doc_id"), coalesce(col("hit"), lit(false)).as("ex"),
        mightContain(col("sh")).as("bl"))
      .groupBy(col("doc_id"))
      .agg(max(col("ex")).as("ex"), max(col("bl")).as("bl"))
    // coalesce: a degenerate corpus (zero non-benchmark docs) must yield
    // (0, 0, true, true) like the oracle's literal columns, not NULLs
    // (sum over zero rows) that NPE a getBoolean caller.
    flags.agg(
        count(lit(1)).as("n_docs"),
        coalesce(sum(when(col("ex"), 1L).otherwise(0L)), lit(0L)).as("n_exact"),
        coalesce(sum(when(col("bl"), 1L).otherwise(0L)), lit(0L)).as("n_bloom"),
        coalesce(sum(when(col("ex") && !col("bl"), 1L).otherwise(0L)), lit(0L)).as("n_missed"))
      .select(col("n_docs"), col("n_exact"),
        (col("n_missed") === 0L).as("superset_ok"),
        (col("n_bloom") - col("n_exact") <=
          greatest(lit(1L), ceil((col("n_docs") - col("n_exact")) * 0.05)
            .cast("long"))).as("fp_ok"))
  }

  val decontaminateBloomGatedSql: String =
    """WITH b AS (
      |  SELECT DISTINCT unnest(list_distinct(list_transform(
      |    generate_series(1, length(text) - 12), i -> substring(text, i, 13)))) AS sh
      |  FROM documents WHERE doc_id % 50 = 0 AND length(text) >= 13
      |), c AS (
      |  SELECT doc_id, unnest(list_distinct(list_transform(
      |    generate_series(1, length(text) - 12), i -> substring(text, i, 13)))) AS sh
      |  FROM documents WHERE doc_id % 50 <> 0 AND length(text) >= 13
      |), f AS (
      |  SELECT DISTINCT c.doc_id FROM c JOIN b USING (sh)
      |)
      |SELECT
      |  CAST((SELECT COUNT(DISTINCT doc_id) FROM c) AS BIGINT) AS n_docs,
      |  CAST((SELECT COUNT(*) FROM f) AS BIGINT) AS n_exact,
      |  TRUE AS superset_ok,
      |  TRUE AS fp_ok""".stripMargin

  /** FUZZY benchmark decontamination — the paraphrase-shaped leak the
    * exact n-gram check ([[decontaminate]]) is blind to: a reworded
    * benchmark item shares few verbatim 13-grams but keeps high
    * shingle-set Jaccard. Corpus docs are flagged by MinHash-LSH
    * banding AGAINST the benchmark side (not a self-join): a corpus
    * doc is a candidate iff it shares a band bucket with some
    * benchmark doc, then candidates verify with EXACT Jaccard ≥
    * [[FuzzyDecontamJaccard]] and the survivors aggregate per corpus
    * doc (match count + best Jaccard — the triage order a curation
    * team works through, riskiest first).
    * Benchmark set = the same deterministic doc_id ≡ 0 (mod 50) slice
    * as the exact check, so the two operators gate the SAME leak
    * surface two ways.
    *
    * Scale shape: the benchmark side is small by nature, so its band
    * frame broadcasts and the corpus band stream never shuffles for
    * candidate generation; verification reuses the adaptive
    * bitmap/array-intersect machinery ([[DedupOps.verifyCandidatesExact]])
    * on the candidate set only. Same banding expressions as the dedup
    * family ([[DedupOps.minhashBands]]), so the LSH layer itself stays
    * under the shared oracle.
    */
  private[graft] val FuzzyDecontamJaccard = 0.25 // triage net, not verdict

  def decontaminateFuzzy(spark: SparkSession, sfDir: String): DataFrame = {
    // corpus-keyed form rides persisted state since round 8: the r=1
    // band rows come from [[DedupOps.ensureFuzzyBandIndex]] and
    // verification bitmaps from the shingle index — identical rows and
    // bands to the in-flight run (same shingledDocs, same banding), so
    // the oracle is unchanged
    val bands = spark.table(DedupOps.ensureFuzzyBandIndex(spark, sfDir))
    val benchIds = Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 50 === 0)
      .select(col("doc_id").as("bench_id"))
    fuzzyTriage(bands, benchIds,
      cand => DedupOps.verifyCandidatesIndexed(
        spark, sfDir, cand, FuzzyDecontamJaccard))
  }

  /** Library core of [[decontaminateFuzzy]] for any (doc_id, text)
    * corpus/benchmark frame pair (ids must not overlap). The 0.25
    * default is deliberately a TRIAGE threshold: at 0.5 shingle-Jaccard
    * a match is near-verbatim (the exact n-gram check usually catches
    * it too); 0.25 is where paraphrase-grade overlap lives, and the
    * output ranks by max_jaccard so a human works the list down.
    */
  def decontaminateFuzzyMetrics(corpus: DataFrame, bench: DataFrame,
      t: Double = FuzzyDecontamJaccard): DataFrame = {
    val n = 5
    val all = corpus.unionByName(bench)
      .filter(length(col("text")) >= n)
      .select(col("doc_id"), DedupOps.shingles(col("text"), n).as("sh"))
      .corpusCheckpoint() // feeds banding AND verification
    // 8 bands × 1 row: the triage threshold sits far below the dedup
    // family's J ≥ 0.5, and 4×2 banding only reaches ~23% recall at
    // J = 0.25 — r = 1 lifts it to 1 − (1 − J)⁸ ≈ 0.90 there
    val bands = DedupOps.minhashBandsWith(all, rowsPerBand = 1)
    val benchIds = bench.select(col("doc_id").as("bench_id"))
    fuzzyTriage(bands, benchIds, { cand =>
      // verification only ever touches candidate docs — restrict the
      // shingle frame first so the vocab/bitmap build is
      // candidate-sized, not corpus-sized
      val candIds = cand.select(col("doc_a").as("doc_id"))
        .union(cand.select(col("doc_b").as("doc_id"))).distinct()
      val needed = all.join(candIds, Seq("doc_id"), "left_semi")
      DedupOps.verifyCandidatesExact(cand, needed, t)
    })
  }

  /** The shared triage skeleton: band-bucket candidates (corpus side
    * anti-joined, benchmark side broadcast), then the caller's
    * verification, then the per-doc match rollup. Both the in-flight
    * and index-served forms route here so candidate semantics cannot
    * drift between them.
    */
  private def fuzzyTriage(bands: DataFrame, benchIds: DataFrame,
      verify: DataFrame => DataFrame): DataFrame = {
    val cand = bands
      .join(broadcast(benchIds),
        col("doc_id") === col("bench_id"), "left_anti")
      // the bench band frame is broadcast EXPLICITLY: the no-shuffle
      // candidate-generation claim must hold by construction, not by
      // hoping AQE converts a checkpoint-derived join
      .join(broadcast(
          bands.join(broadcast(benchIds), col("doc_id") === col("bench_id"),
            "left_semi")
            .select(col("doc_id").as("bench_doc"), col("bucket"))),
        Seq("bucket"))
      .select(col("doc_id").as("doc_a"), col("bench_doc").as("doc_b"))
      .distinct()
      .corpusCheckpoint() // read twice: the id restriction and the verify
    fuzzyRollup(verify(cand))
  }

  /** Shared rollup of verified (doc_a, jaccard) pairs into the gated
    * output shape — ONE definition so the batch key's triage and the
    * lifecycle's accumulated-state verification can never drift from
    * the oracle's GROUP BY. */
  private def fuzzyRollup(verified: DataFrame): DataFrame =
    verified
      .groupBy(col("doc_a"))
      .agg(count(lit(1)).as("n_bench_matches"),
        round(max(col("jaccard")), 6).as("max_jaccard"))
      .select(col("doc_a").as("doc_id"), col("n_bench_matches"),
        col("max_jaccard"))
      .orderBy(col("doc_id"))

  val decontaminateFuzzySql: String =
    s"""WITH ${DedupOps.minhashBandCtesWith(1)}, cand AS (
       |  SELECT l.doc_id AS doc_a, r.doc_id AS doc_b
       |  FROM bands l JOIN bands r
       |    ON l.bucket = r.bucket AND l.doc_id % 50 <> 0 AND r.doc_id % 50 = 0
       |  GROUP BY 1, 2
       |), sizes AS (
       |  SELECT doc_id, CAST(len(sh) AS BIGINT) AS n_sh FROM docs
       |), inter AS (
       |  SELECT c.doc_a, c.doc_b,
       |    CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS n_inter
       |  FROM cand c
       |  JOIN docs a ON a.doc_id = c.doc_a
       |  JOIN docs b ON b.doc_id = c.doc_b
       |), verified AS (
       |  SELECT i.doc_a,
       |    CAST(i.n_inter AS DOUBLE)
       |      / CAST(sa.n_sh + sb.n_sh - i.n_inter AS DOUBLE) AS j
       |  FROM inter i
       |  JOIN sizes sa ON i.doc_a = sa.doc_id
       |  JOIN sizes sb ON i.doc_b = sb.doc_id
       |  WHERE CAST(i.n_inter AS DOUBLE)
       |      / CAST(sa.n_sh + sb.n_sh - i.n_inter AS DOUBLE) >= $FuzzyDecontamJaccard
       |)
       |SELECT doc_a AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_bench_matches,
       |  ROUND(MAX(j), 6) AS max_jaccard
       |FROM verified
       |GROUP BY 1
       |ORDER BY doc_id""".stripMargin

  /** Candidate half of the streamed decontamination with a PREBUILT
    * benchmark band side — the 100 TB shape the streaming scaladoc
    * documents: `benchBands` (doc_id, bucket) is computed ONCE and
    * broadcast-reused, so a micro-batch only shingles and bands
    * ITSELF, and emits nothing but its (doc_a, doc_b) candidate
    * pairs. A doc's minhash signature depends only on its own shingle
    * set, so banding corpus rows alone yields exactly the corpus-side
    * band rows [[decontaminateFuzzyMetrics]] would produce — the
    * candidate set is identical, per-doc, to the one-pass batch run's
    * (the input must be disjoint from the benchmark, which the %50
    * split guarantees).
    */
  private[graft] def fuzzyCandidatesAgainst(corpus: DataFrame,
      benchBands: DataFrame): DataFrame = {
    val n = 5
    val csh = corpus.filter(length(col("text")) >= n)
      .select(col("doc_id"), DedupOps.shingles(col("text"), n).as("sh"))
    fuzzyCandidatesFromBands(
      DedupOps.minhashBandsWith(csh, rowsPerBand = 1), benchBands)
  }

  /** Shared candidate join of (doc_id, bucket) band frames — ONE
    * definition so the in-flight streaming form and the lifecycle's
    * index-bootstrapped bulk half can never produce different pair
    * semantics. */
  private[graft] def fuzzyCandidatesFromBands(corpusBands: DataFrame,
      benchBands: DataFrame): DataFrame =
    corpusBands
      .join(broadcast(benchBands
          .select(col("doc_id").as("bench_doc"), col("bucket"))),
        Seq("bucket"))
      .select(col("doc_id").as("doc_a"), col("bench_doc").as("doc_b"))
      .distinct()

  /** The fuzzy-decontamination LIFECYCLE under the oracle — stream ≡
    * batch proof #9, in the accumulated-state shape of the substring
    * lifecycle: the streamed STATE is the (doc_a, doc_b) CANDIDATE
    * set. The EVEN corpus doc_ids' candidates vs the static benchmark
    * are batch-built into an epoch table; the ODD corpus doc_ids
    * stream through
    * [[graft.streaming.DocStream.appendDecontamCandidatesStream]]
    * (per micro-batch: shingle + band SELF only, join the prebuilt
    * broadcast benchmark bands, append pairs — no per-batch
    * verification); then ONE exact-Jaccard verification pass over the
    * accumulated candidates produces the metric, gated under the
    * verbatim [[decontaminateFuzzySql]] oracle. Deterministic by
    * construction: a doc's candidates involve only that doc and the
    * benchmark, so batch boundaries and replay order cannot change the
    * accumulated SET (no streaming state store, no watermark, no
    * sentinel). The benchmark split is the SAME doc_id % 50 the batch
    * key uses. Verifying once at read time instead of per batch is
    * also the 100 TB shape: the stream stays a cheap band join, and
    * the expensive verification amortizes over the whole accumulated
    * index. Rotates a fresh epoch every call and prunes to two.
    */
  def decontaminateLifecycle(spark: SparkSession, sfDir: String): DataFrame = {
    val base = "graft_dcf_lc_" + Layout.corpusTag(sfDir)
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val corpus = docs.filter(col("doc_id") % 50 =!= 0)
    // The bulk half bootstraps from the PERSISTED fuzzy band index —
    // the production shape: the historical corpus is already indexed
    // (same band rows the batch key rides, built from the same
    // expressions), so only ARRIVING docs band in-flight.
    val bandsIdx = spark.table(DedupOps.ensureFuzzyBandIndex(spark, sfDir))
    val benchBands = bandsIdx.filter(col("doc_id") % 50 === 0)
      .select(col("doc_id"), col("bucket"))
      .corpusCheckpoint() // |bench|·8 rows, broadcast into every batch
    val t = Layout.rotateEpoch(spark, base) { name =>
      fuzzyCandidatesFromBands(
          bandsIdx.filter(col("doc_id") % 50 =!= 0 && col("doc_id") % 2 === 0),
          benchBands)
        .write.format("parquet").mode("overwrite").saveAsTable(name)
    }
    val odd = corpus.filter(col("doc_id") % 2 =!= 0)
      .select(col("doc_id"), col("text"))
    Layout.replayAsStream(odd, "graft-dcflc") { stream =>
      graft.streaming.DocStream.appendDecontamCandidatesStream(
        stream, benchBands, t)
    }
    Layout.pruneEpochs(spark, base, keep = 2)
    // ONE verification over the accumulated candidate state, served by
    // the SAME persisted shingle-bitmap index the batch key rides
    // (verifyCandidatesIndexed — codegen'd popcount over prebuilt
    // bitmaps; its in-flight fallback is candidate-restricted), rolled
    // up by the SAME fuzzyRollup the batch key's triage uses
    val cand = spark.table(t).distinct()
    fuzzyRollup(DedupOps.verifyCandidatesIndexed(
      spark, sfDir, cand, FuzzyDecontamJaccard))
  }

  /** RE2-safe PII patterns (no lookahead — Java regex and RE2 agree). */
  val emailPattern = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val longNumberPattern = "[0-9]{7,}"

  /** PII scrub: redact emails and 7+-digit number runs, report match
    * counts and the scrubbed content hash (the auditable artifact a
    * curation pipeline logs per document).
    */
  /** Library core: the scrubbed form of a text column. */
  def scrubbedText(c: Column): Column =
    regexp_replace(regexp_replace(c, emailPattern, "<EMAIL>"),
      longNumberPattern, "<NUM>")

  def piiScrub(spark: SparkSession, sfDir: String): DataFrame = {
    val scrubbed = scrubbedText(col("text"))
    Tables.documentsFanned(spark, sfDir)
      .select(col("doc_id"),
        size(regexp_extract_all(col("text"), lit(emailPattern), lit(0)))
          .cast("long").as("n_emails"),
        size(regexp_extract_all(col("text"), lit(longNumberPattern), lit(0)))
          .cast("long").as("n_long_numbers"),
        md5(scrubbed).as("scrubbed_md5"))
      .orderBy(col("doc_id"))
  }

  val piiScrubSql: String =
    """SELECT doc_id,
      |  CAST(len(regexp_extract_all(text,
      |    '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}')) AS BIGINT) AS n_emails,
      |  CAST(len(regexp_extract_all(text, '[0-9]{7,}')) AS BIGINT) AS n_long_numbers,
      |  md5(regexp_replace(
      |    regexp_replace(text,
      |      '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
      |    '[0-9]{7,}', '<NUM>', 'g')) AS scrubbed_md5
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** Hashed-feature bucket count for DSIR — small enough that the
    * trained ratio model always broadcasts, large enough that bucket
    * collisions stay rare at the n-gram vocabulary sizes the hashing
    * trick targets (Xie et al. 2023 use 10⁴; the principle is the
    * same at any power of two).
    */
  private[graft] val DsirBuckets = 1024L

  /** DSIR importance weighting (Data Selection via Importance
    * Resampling, Xie et al. 2023): score every raw document by how
    * much more likely its hashed n-gram features are under a TARGET
    * domain's feature distribution than under the raw corpus's, then
    * keep the top quartile — the published recipe for selecting
    * pretraining data that "looks like" a trusted corpus without
    * training a classifier. Target here = the `lang = 'en'` slice;
    * features = word unigrams + adjacent bigrams hashed by the
    * engine-portable [[graft.functions.RollingHash]] into
    * [[DsirBuckets]] buckets (the hashing trick — memory is O(B), not
    * O(vocab)).
    *
    * Oracle-exactness (the q_lm_score precedent): DSIR's
    * geometric-mean likelihood ratio (exp of mean log-ratio) is
    * replaced by the ARITHMETIC mean of per-feature add-1-smoothed
    * ratios in integer micro units, `r_micro[b] = (10⁶·(c_t[b]+1))
    * div (c_r[b]+1)` — same order statistic family, zero FP in model
    * or apply. The corpus-constant normalization `(N_r+B)/(N_t+B)`
    * scales every doc identically so it is irrelevant to selection
    * and deliberately not folded into the per-bucket ratios (keeps
    * every intermediate within BIGINT at any corpus size: c ≤ 10¹²
    * occurrences per bucket before 10⁶·(c+1) overflows). The keep
    * rule is deterministic zero-temperature resampling: `dsir_micro ≥
    * exact 75th percentile`, the interpolated-percentile form both
    * engines define identically (q_doc_quantiles precedent).
    *
    * Scale shape: feature extraction and hashing are row-local in the
    * scan stage (codegen'd RollingHash), and that pass — the dominant
    * cost — runs exactly once: its output rolls straight up to per-doc
    * bucket multiplicities (map-side combine, ONE corpus-wide shuffle)
    * and is checkpointed; the model build (a ≤ B-row aggregate) and
    * the scoring join both read the compact frame (the q_lm_score
    * pattern). The model broadcasts at any corpus size, the scoring
    * rollup map-side-combines to one row per doc, and the keep
    * threshold is a 1-row broadcast (allowlisted single-row crossJoin,
    * the q_bm25_topk pattern). Exact percentile state is corpus-wide
    * distinct scores — at 100 TB swap in percentile_approx and bound
    * it like q_doc_quantiles_approx; the plan shape is unchanged.
    */
  def dsirWeights(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = TextOps.tokens(col("text"))
    // Spark's sequence(1, n) DESCENDS when n < 1 — guard the bigram arm
    val bigrams = when(size(col("toks")) >= 2,
      transform(sequence(lit(1), size(col("toks")) - 1),
        i => concat_ws(" ",
          element_at(col("toks"), i), element_at(col("toks"), i + 1))))
      .otherwise(array().cast("array<string>"))
    // The expensive pass — tokenize, build bigram strings, hash — runs
    // ONCE: the exploded feature stream is immediately rolled up to
    // per-doc bucket multiplicities and checkpointed; both the model
    // build and the scoring join read the compact (doc, bucket, m)
    // frame. The hash sits AFTER the explode as a top-level codegen'd
    // expression (inside a transform() lambda it would drop the
    // projection out of whole-stage codegen — HOFs are interpreted).
    val fc = Tables.documentsFanned(spark, sfDir)
      .select(col("doc_id"), (col("lang") === "en").as("is_t"), toks.as("toks"))
      .filter(size(col("toks")) >= 1)
      .select(col("doc_id"), col("is_t"),
        explode(concat(col("toks"), bigrams)).as("f"))
      .select(col("doc_id"), col("is_t"),
        (graft.functions.RollingHash(col("f")) % DsirBuckets).as("b"))
      .groupBy(col("doc_id"), col("is_t"), col("b"))
      .agg(count(lit(1)).as("m"))
      .corpusCheckpoint() // read twice: model build + scoring join
    val model = fc.groupBy(col("b")) // ≤ DsirBuckets keys
      .agg(sum(col("m")).as("c_r"),
        sum(when(col("is_t"), col("m")).otherwise(0L)).as("c_t"))
      .select(col("b"), expr("(1000000 * (c_t + 1)) div (c_r + 1)").as("r_micro"))
    val scored = fc.join(broadcast(model), "b")
      .groupBy(col("doc_id"))
      .agg(sum(col("m")).as("n_feats"),
        expr("sum(m * r_micro) div sum(m)").as("dsir_micro"))
    val thr = scored.agg(
      round(expr("percentile(dsir_micro, 0.75)"), 6).as("thr"))
    scored.crossJoin(broadcast(thr))
      .select(col("doc_id"), col("n_feats"), col("dsir_micro"),
        (col("dsir_micro") >= col("thr")).as("keep"))
      .orderBy(col("doc_id"))
  }

  val dsirWeightsSql: String =
    """WITH base AS (
      |  SELECT doc_id, lang = 'en' AS is_t, toks FROM (
      |    SELECT doc_id, lang, list_filter(
      |      string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
      |    FROM documents)
      |  WHERE len(toks) >= 1
      |), feats AS (
      |  SELECT doc_id, is_t, unnest(toks || CASE WHEN len(toks) >= 2
      |    THEN list_transform(generate_series(1, len(toks) - 1),
      |      i -> toks[i] || ' ' || toks[i + 1])
      |    ELSE [] END) AS f
      |  FROM base
      |), hashed AS (
      |  SELECT doc_id, is_t,
      |    list_reduce(
      |      list_prepend(CAST(0 AS BIGINT),
      |        list_transform(string_split(f, ''),
      |          x -> CAST(ascii(x) AS BIGINT))),
      |      (h, c) -> (h * 31 + c) % 1000000007) % 1024 AS b
      |  FROM feats
      |), fcb AS (
      |  SELECT doc_id, is_t, b, CAST(COUNT(*) AS BIGINT) AS m
      |  FROM hashed GROUP BY 1, 2, 3
      |), model AS (
      |  SELECT b,
      |    CAST((1000000 * (SUM(CASE WHEN is_t THEN m ELSE 0 END) + 1))
      |      // (SUM(m) + 1) AS BIGINT) AS r_micro
      |  FROM fcb GROUP BY 1
      |), scored AS (
      |  SELECT doc_id,
      |    CAST(SUM(m) AS BIGINT) AS n_feats,
      |    CAST(SUM(m * r_micro) // SUM(m) AS BIGINT) AS dsir_micro
      |  FROM fcb JOIN model USING (b)
      |  GROUP BY 1
      |), thr AS (
      |  SELECT ROUND(quantile_cont(dsir_micro, 0.75), 6) AS thr FROM scored
      |)
      |SELECT doc_id, n_feats, dsir_micro, dsir_micro >= thr AS keep
      |FROM scored CROSS JOIN thr
      |ORDER BY doc_id""".stripMargin

  /** Cluster-balanced sampling (the DataComp / MetaCLIP balancing
    * move): assign every embedding to its TRAINED k-means cluster,
    * then flatten the cluster distribution — each cluster gets a
    * deterministic keep-rate `min(100%, ⌈N/k⌉ / n_cluster)` so
    * over-represented modes are downsampled toward a uniform
    * per-cluster budget while rare clusters keep everything. The
    * within-cluster choice is the [[stratifiedFilter]] hash predicate
    * (md5 bucket < rate), so the sample is reproducible on any cluster
    * layout and resample-stable: changing one cluster's rate never
    * reshuffles another's survivors.
    *
    * Scale shape: rides [[SimilarityOps.ensureIvfTrainedIndex]] — the
    * (vec_id, cell) scan is the persisted index bucketed BY cell, so
    * the per-cluster count aggregates with NO exchange
    * (bucketed-write elimination, the LayoutSpec-asserted pattern);
    * the k-row plan re-joins broadcast and the keep predicate is
    * row-local md5. Everything after the one-time index build is
    * integer arithmetic — no FP anywhere in rates or keeps.
    */
  def clusterBalance(spark: SparkSession, sfDir: String): DataFrame = {
    val name = SimilarityOps.ensureIvfTrainedIndex(spark, sfDir)
    val a = spark.table(name).select(col("vec_id"), col("cell"))
    val counts = a.groupBy(col("cell")).agg(count(lit(1)).as("n_cell"))
    val tot = counts.agg(sum(col("n_cell")).as("n_tot"),
      count(lit(1)).as("k"))
    val plan = counts.crossJoin(broadcast(tot))
      .select(col("cell"), col("n_cell"),
        least(lit(100L),
          expr("(100 * ((n_tot + k - 1) div k)) div n_cell")).as("rate"))
    val bucket = md5Bucket(col("vec_id"))
    a.join(broadcast(plan), "cell")
      .select(col("vec_id"), col("cell"), col("n_cell"), col("rate"),
        (bucket < col("rate")).as("keep"))
      .orderBy(col("vec_id"))
  }

  /** CLUSTER LABELING (cluster-then-label — the "data map" step after
    * clustering: Nomic-Atlas / lilac-style corpus cartography, and the
    * per-cluster inspection signal quality audits run before setting
    * mixing rates): every trained-IVF cell labeled by its members' top-3
    * tf·idf terms. Composes TWO persisted indexes the repo already
    * serves — the cell-bucketed IVF assignments
    * ([[SimilarityOps.ensureIvfTrainedIndex]]) and the term-bucketed
    * positional postings ([[TextOps.ensureInvertedIndex]], whose tf and
    * n_docs sidecar are already oracle-gated elsewhere) — joined on the
    * doc spine (vec_id ≡ doc_id in the testdata contract, FIXTURES.md).
    * Scoring is the [[TextOps.tfidfTopTerms]] discipline verbatim
    * (tf·ln(N/df) at round-6) aggregated to cell grain, ranked by ONE
    * window over the (cell, term) grain — k·|cells| output rows.
    *
    * Scale shape: the postings tf scan and the index scan each pay one
    * doc_id exchange into the join (neither is bucketed by doc — the
    * honest cost of crossing the two index layouts), then everything
    * downstream lives at (cell, term) grain ≤ vocab·k rows; map-side
    * combine bounds the exchange. The window partitions by cell — no
    * global sort, no corpus-sized window.
    */
  def clusterTopics(spark: SparkSession, sfDir: String): DataFrame = {
    val k = 3
    val idx = SimilarityOps.ensureIvfTrainedIndex(spark, sfDir)
    val cells = spark.table(idx).select(col("vec_id").as("doc_id"), col("cell"))
    val name = TextOps.ensureInvertedIndex(spark, sfDir)
    val tf = spark.table(name).select(col("doc_id"), col("term"), col("tf"))
    val nDocs = spark.table(name + "_stats")
      .select(col("n_docs").cast("double").as("n_docs"))
    val dfT = tf.groupBy(col("term")).agg(count(lit(1)).cast("double").as("df"))
    val cellTf = tf.join(cells, "doc_id")
      .groupBy(col("cell"), col("term")).agg(sum(col("tf")).as("ctf"))
    val scored = cellTf.join(dfT, "term").crossJoin(broadcast(nDocs))
      .select(col("cell"), col("term"),
        round(col("ctf").cast("double") * log(col("n_docs") / col("df")), 6)
          .as("score"))
    val w = Window.partitionBy(col("cell")).orderBy(col("score").desc, col("term"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("cell"), col("rank"), col("term"), col("score"))
      .orderBy(col("cell"), col("rank"))
  }

  val clusterTopicsSql: String =
    s"""WITH ${SimilarityOps.ivfAssignCtes}, tok AS (
       |  SELECT doc_id, unnest(list_filter(
       |    string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS term
       |  FROM documents
       |), tfq AS (
       |  SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2
       |), nn AS (
       |  SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents
       |), dfq AS (
       |  SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tfq GROUP BY term
       |), ctf AS (
       |  SELECT cells.cell, tfq.term, SUM(tfq.tf) AS ctf
       |  FROM tfq JOIN cells ON tfq.doc_id = cells.vec_id
       |  GROUP BY 1, 2
       |), sc AS (
       |  SELECT ctf.cell, ctf.term,
       |    ROUND(CAST(ctf.ctf AS DOUBLE) * LN(nn.n_docs / dfq.df), 6) AS score
       |  FROM ctf JOIN dfq USING (term) CROSS JOIN nn
       |), rr AS (
       |  SELECT cell, term, score,
       |    CAST(row_number() OVER (PARTITION BY cell
       |      ORDER BY score DESC, term) AS BIGINT) AS rank
       |  FROM sc
       |)
       |SELECT cell, rank, term, score FROM rr WHERE rank <= 3
       |ORDER BY cell, rank""".stripMargin

  val clusterBalanceSql: String =
    s"""WITH ${SimilarityOps.ivfAssignCtes}, counts AS (
       |  SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_cell FROM cells GROUP BY 1
       |), tot AS (
       |  SELECT CAST(SUM(n_cell) AS BIGINT) AS n_tot,
       |    CAST(COUNT(*) AS BIGINT) AS k
       |  FROM counts
       |), plan AS (
       |  SELECT cell, n_cell,
       |    LEAST(100, CAST((100 * ((n_tot + k - 1) // k)) // n_cell AS BIGINT)) AS rate
       |  FROM counts CROSS JOIN tot
       |)
       |SELECT c.vec_id, c.cell, p.n_cell, p.rate,
       |  CAST(CONCAT('0x', substring(md5(CAST(c.vec_id AS VARCHAR)), 1, 8)) AS BIGINT)
       |    % 100 < p.rate AS keep
       |FROM cells c JOIN plan p USING (cell)
       |ORDER BY c.vec_id""".stripMargin
}
