package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import Materialize.CorpusSyntax

/** Vector similarity search over the `embeddings` table
  * (`embedding: array<float>`, dim 64) — SURVEY.md §2b.
  *
  * Scale notes:
  *  - Dot products / norms are built with `zip_with` + `aggregate`
  *    higher-order functions: a sequential, deterministic fold in
  *    generated code — no UDF, stays inside whole-stage codegen.
  *  - Brute-force top-k is the exact baseline: broadcast the query
  *    vector(s), row-local score, then `orderBy(score).limit(k)` which
  *    Spark plans as TakeOrderedAndProject — per-partition top-k heaps +
  *    single driver merge of k×partitions rows, NOT a global sort. That
  *    shape is exactly right at 100 TB (each executor returns k rows).
  *  - The ANN scale path is LSH bucketing (random hyperplane signs →
  *    bucket key, one shuffle, per-bucket top-k) — see `annLshTopK`.
  *    Hyperplanes are seeded deterministically so results are
  *    reproducible run-to-run.
  */
object SimilarityOps {

  /** Σ aᵢ·bᵢ over two float-array columns, accumulated in double via a
    * sequential fold (deterministic order ⇒ bitwise-reproducible).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine via the native fused expression (codegen'd single pass) —
    * numerically identical to [[cosineHof]] (spec-asserted), 10-50×
    * faster in pair-scoring loops because HOF lambdas are interpreted.
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.CosineSimilarity(a, b)

  /** Reference composed form, kept for the equivalence spec. */
  private[graft] def cosineHof(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Exact top-10 nearest neighbors (cosine) of vec_id=0's embedding
    * among all other vectors. Scores rounded to 4 decimals in the output
    * AND in the sort key so the cross-engine compare is immune to the
    * ~1e-13 float-accumulation-order noise.
    */
  def knnCosine(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddingsFanned(spark, sfDir)
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("q_embedding"))
    e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(cosine(col("embedding"), col("q_embedding")), 4).as("score"))
      .orderBy(col("score").desc, col("vec_id"))
      .limit(10)
  }

  val knnCosineSql: String =
    """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
      |pairs AS (
      |  SELECT e.vec_id,
      |    CAST(unnest(e.embedding) AS DOUBLE) AS x,
      |    CAST(unnest(q.qe) AS DOUBLE) AS y
      |  FROM embeddings e, q
      |  WHERE e.vec_id <> 0
      |), s AS (
      |  SELECT vec_id,
      |    SUM(x*y) / (SQRT(SUM(x*x)) * SQRT(SUM(y*y))) AS score
      |  FROM pairs GROUP BY vec_id
      |)
      |SELECT vec_id, ROUND(score, 4) AS score
      |FROM s
      |ORDER BY ROUND(score, 4) DESC, vec_id
      |LIMIT 10""".stripMargin

  /** Per-label centroid-free stats: count + mean L2 norm by label.
    * Cheap sanity aggregate over the vector column (norms are row-local;
    * one small shuffle on label). Norm sum is rounded post-aggregation;
    * with ≤10 labels and sequential per-group accumulation both engines
    * agree at 4 decimals.
    */
  def embeddingStats(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.embeddingsFanned(spark, sfDir)
      .select(col("label"), round(norm(col("embedding")), 6).as("nrm"))
      .groupBy(col("label"))
      .agg(
        count(lit(1)).as("n_vecs"),
        round(sum(col("nrm")), 3).as("norm_sum"))
      .orderBy(col("label"))
  }

  val embeddingStatsSql: String =
    """WITH x AS (
      |  SELECT vec_id, label, CAST(unnest(embedding) AS DOUBLE) AS v
      |  FROM embeddings
      |), norms AS (
      |  SELECT vec_id, label, ROUND(SQRT(SUM(v*v)), 6) AS nrm
      |  FROM x GROUP BY vec_id, label
      |)
      |SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
      |  ROUND(SUM(nrm), 3) AS norm_sum
      |FROM norms GROUP BY label
      |ORDER BY label""".stripMargin

  /** EXACT second-moment (Gram) matrix of the embedding corpus plus
    * the centered-covariance NUMERATORS — the input every PCA /
    * whitening / ZCA step of an embedding pipeline reduces first.
    * Vectors quantize to integer micros up front with
    * `floor(x·1e6 + 0.5)` — NOT `round`: a float32 component of the
    * form odd/2^k can land on an exact .5 tie under ×1e6, and ROUND's
    * tie convention (half-up vs half-to-even) is an engine-version
    * choice, the exact cross-engine drift class that bit
    * q_random_projection in round 11. `floor` is unambiguous in every
    * engine, so no tie convention is on the hash path. With micros
    * pinned, for each dimension pair i ≤ j the
    * outputs are exact integers both engines must reproduce digit for
    * digit: `dot = Σ_v m_i·m_j` and
    * `cov_numer = N·dot − (Σ m_i)·(Σ m_j)` — N² times the centered
    * covariance, computed as an undivided DECIMAL(38,0) so no division
    * or float ever enters (N·Σm² ≥ (Σm)² by Cauchy–Schwarz, so the
    * diagonal is provably non-negative, spec-asserted). The eigensolve
    * that follows PCA is an O(d³) driver-side step on this 64×64
    * result at any corpus size — the reduction here is the 100 TB part.
    *
    * OUTPUT TYPE (the r12/r13/r14 driver-drift fix, in three acts):
    * r12 surfaced DECIMAL(38,0) — red; r13 cast to BIGINT — still red;
    * yet `q_pq_topk` (same quantize, exact integer micro-sums up to
    * ~2.6·10¹⁴, drift-sensitive argmins) passes every round, clearing
    * the quantize AND proving int64 *below 2^53* crosses the gate
    * clean. The lone distinguishing feature of this key's surface was
    * `cov_numer` magnitude: up to N²·d·max(m)² ≈ 7·10¹⁶ at the gate
    * scale — ABOVE 2^53, where any float64 round-trip in a compare
    * canon silently quantizes to multiples of 2ᵏ. The repo already
    * holds the controlled experiment: `q_table_checksum` sums 56-bit
    * hashes to >2^53 totals and passes — because it crosses the gate
    * as a decimal STRING. So: `dot` stays BIGINT (≤ N·max(m)² ≈ 10¹⁴,
    * comfortably sub-2^53 through N ≈ 3·10⁷ vectors), and `cov_numer`
    * crosses as the exact digit string (DECIMAL(38,0)→VARCHAR both
    * sides, the proven tableChecksum pattern) — no IEEE representation
    * on any gated value at any magnitude. Consumers wanting numerics
    * read [[gramPartialsOf]]'s full-decimal plan directly.
    * `q_embedding_micros` gates the shared quantize leg separately so
    * any residual driver drift bisects to quantize vs reduce.
    *
    * Plan: one posexplode to (vec_id, i, m) materialized once, a
    * co-partitioned equi-self-join on vec_id whose i ≤ j output feeds
    * a map-side-combined aggregate straight down to ≤ d(d+1)/2 = 2080
    * groups (the joined rows never shuffle — the final exchange
    * carries partial rows per (i,j) group only), plus a 64-row
    * dimension-sum aggregate and a 1-row count. At 100 TB the N·d²
    * multiply-adds are the honest Gramian FLOPs any implementation
    * pays; nothing corpus-sized moves after the vec_id exchange.
    */
  /** (vec_id, i, m) integer-micro component rows for any vector frame —
    * the ONE quantize+explode definition shared by [[embeddingCovariance]]
    * and the Gramian partial encode path ([[gramPartialsOf]]), so bulk
    * build, full reduction, and streamed maintenance cannot drift. */
  private[graft] def microComponents(vectors: DataFrame): DataFrame = {
    val micros = transform(col("embedding"),
      x => floor(x.cast("double") * 1000000d + 0.5d).cast("long"))
    vectors
      .select(col("vec_id"), posexplode(micros).as(Seq("p", "m")))
      .select(col("vec_id"), (col("p") + 1).cast("long").as("i"), col("m"))
      .corpusCheckpoint() // N·d rows; read by both join sides (+ dim sums)
  }

  /** Upper-triangle Gramian (i ≤ j, exact DECIMAL(38,0) dot) over a
    * component frame — the covariance plan's dot leg. */
  private def dotOf(e: DataFrame): DataFrame =
    e.select(col("vec_id"), col("i"), col("m"))
      .join(e.select(col("vec_id"), col("i").as("j"), col("m").as("mj")), "vec_id")
      .filter(col("i") <= col("j"))
      .groupBy(col("i"), col("j"))
      .agg(sum(col("m").cast("decimal(18,0)") * col("mj").cast("decimal(18,0)"))
        .cast("decimal(38,0)").as("dot"))

  /** The Gramian PARTIAL for any vector subset — dot is additive over
    * vector subsets (Σ_v m_i·m_j splits over any partition of v), so
    * per-batch partials from this one definition re-aggregate exactly
    * to the full-corpus Gramian: the encode path shared by
    * [[powerLifecycle]]'s bulk build and streamed appends
    * ([[graft.streaming.VectorStream.appendGramStream]]). */
  private[graft] def gramPartialsOf(vectors: DataFrame): DataFrame =
    dotOf(microComponents(vectors))

  def embeddingCovariance(spark: SparkSession, sfDir: String): DataFrame = {
    val e = microComponents(
      Tables.embeddingsFanned(spark, sfDir).select(col("vec_id"), col("embedding")))
    val dot = dotOf(e)
    val dims = e.groupBy(col("i"))
      .agg(sum(col("m").cast("decimal(18,0)")).cast("decimal(18,0)").as("s"))
    val n = Tables.embeddings(spark, sfDir)
      .agg(count(lit(1)).cast("decimal(10,0)").as("n"))
    dot
      .join(dims.select(col("i"), col("s").as("si")), "i")
      .join(dims.select(col("i").as("j"), col("s").as("sj")), "j")
      .crossJoin(broadcast(n))
      .select(col("i"), col("j"), col("dot").cast("long").as("dot"),
        (col("n") * col("dot") - col("si") * col("sj"))
          .cast("decimal(38,0)").cast("string").as("cov_numer"))
      .orderBy(col("i"), col("j"))
  }

  val embeddingCovarianceSql: String =
    """WITH m AS (
      |  SELECT vec_id, CAST(t.i AS BIGINT) AS i,
      |    CAST(FLOOR(CAST(embedding[t.i] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS m
      |  FROM embeddings, range(1, 65) t(i)
      |), s AS (
      |  SELECT a.i AS i, b.i AS j, SUM(CAST(a.m AS HUGEINT) * b.m) AS dot
      |  FROM m a JOIN m b ON a.vec_id = b.vec_id AND a.i <= b.i
      |  GROUP BY 1, 2
      |), d AS (
      |  SELECT i, SUM(CAST(m AS HUGEINT)) AS sm FROM m GROUP BY 1
      |), n AS (
      |  SELECT CAST(COUNT(*) AS HUGEINT) AS n FROM embeddings
      |)
      |SELECT s.i, s.j, CAST(s.dot AS BIGINT) AS dot,
      |  CAST(CAST(n.n * s.dot - da.sm * db.sm AS DECIMAL(38,0)) AS VARCHAR) AS cov_numer
      |FROM s JOIN d da ON da.i = s.i JOIN d db ON db.i = s.j CROSS JOIN n
      |ORDER BY s.i, s.j""".stripMargin

  /** DIAGNOSTIC GATE for the shared quantize+explode leg
    * ([[microComponents]]): per-dimension count / sum / sum-of-squares
    * checksums of the integer micros, every output a plain BIGINT. If
    * [[embeddingCovariance]] ever drifts in an oracle environment again
    * while this key stays green, the drift is in the reduction/output
    * legs; if THIS key drifts, the IEEE quantize expression itself
    * differs between engines (e.g. FMA contraction of `x·1e6 + 0.5`)
    * and the quantize must move to an exact power-of-two scale.
    * Bounds: |m| ≤ 6·10⁵ ⇒ smm ≤ N·3.6·10¹¹ — int64-exact through
    * N ≈ 2.5·10⁷ vectors. */
  def embeddingMicros(spark: SparkSession, sfDir: String): DataFrame = {
    val e = microComponents(
      Tables.embeddingsFanned(spark, sfDir).select(col("vec_id"), col("embedding")))
    e.groupBy(col("i"))
      .agg(count(lit(1)).cast("long").as("cnt"),
        sum(col("m")).cast("long").as("sm"),
        sum(col("m") * col("m")).cast("long").as("smm"))
      .orderBy(col("i"))
  }

  val embeddingMicrosSql: String =
    """WITH m AS (
      |  SELECT vec_id, CAST(t.i AS BIGINT) AS i,
      |    CAST(FLOOR(CAST(embedding[t.i] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS m
      |  FROM embeddings, range(1, 65) t(i)
      |)
      |SELECT i, CAST(COUNT(*) AS BIGINT) AS cnt, CAST(SUM(m) AS BIGINT) AS sm,
      |  CAST(SUM(m * m) AS BIGINT) AS smm
      |FROM m GROUP BY i ORDER BY i""".stripMargin

  /** EXACT-INTEGER POWER ITERATION on the embedding Gramian — the PCA
    * step that CONSUMES [[embeddingCovariance]]'s reduction: the
    * dominant principal direction of the corpus, the vector a whitening
    * / low-rank-projection pipeline extracts first. The corpus-scale
    * work is the distributed N·d² Gramian (the covariance plan,
    * unchanged); the iteration itself is O(d²) per step on the
    * 2080-entry matrix — driver-sized at ANY corpus size by the
    * algorithm's own bound (the PQ codebook / ADC-table
    * collect-small-state precedent, d(d+1)/2 rows).
    *
    * Every quantity is an exact integer so both engines reproduce the
    * composition digit for digit: v₀ = 1e6·𝟙; one step is
    * w = G·v (BigInt — |w| ≤ d·N·1e12·1e6 < 10³⁸ at any tested scale)
    * followed by the rescale v' = trunc(w·1e6 / max|w|) — truncating
    * division toward zero, which BigInt, Spark, and DuckDB's `//` all
    * share (verified incl. negative dividends), so no rounding
    * convention is on the hash path. [[PowerIters]] unrolled steps; the
    * oracle replays the Gramian AND every step as chained CTEs, so ONE
    * hash gates reduction + iteration end to end. Convergence to the
    * top eigenvector is spec-asserted semantically (monotone Rayleigh
    * quotient + ≥0.999 cosine agreement with a double-precision
    * reference); the GATE is exactness of the fixed-step computation.
    */
  private[graft] val PowerIters = 3

  def powerIteration(spark: SparkSession, sfDir: String): DataFrame =
    powerIterationFrom(spark,
      embeddingCovariance(spark, sfDir).select(col("i"), col("j"), col("dot")))

  /** The iteration itself over any upper-triangle (i, j, dot) frame —
    * shared by [[powerIteration]] and [[powerLifecycle]] so the
    * fixed-step computation cannot drift between the one-shot and the
    * maintained-Gramian form. */
  private def powerIterationFrom(spark: SparkSession, triDf: DataFrame): DataFrame = {
    val d = 64
    val tri = triDf
      .collect() // d(d+1)/2 = 2080 rows — the algorithm's own constant
      .map(r => (r.getLong(0).toInt, r.getLong(1).toInt, r.get(2) match {
        // covariance's gated surface emits int64 dot; the lifecycle's
        // maintained-partials frame stays DECIMAL(38,0) — accept both.
        case d: java.math.BigDecimal => BigInt(d.toBigInteger)
        case l: java.lang.Long       => BigInt(l.longValue)
      }))
    val g = Array.ofDim[BigInt](d + 1, d + 1)
    for (i <- 1 to d; j <- 1 to d) g(i)(j) = BigInt(0)
    tri.foreach { case (i, j, v) => g(i)(j) = v; g(j)(i) = v }
    var v = Array.fill(d)(BigInt(1000000))
    for (_ <- 1 to PowerIters) {
      val w = Array.tabulate(d)(i0 =>
        (1 to d).map(j => g(i0 + 1)(j) * v(j - 1)).sum)
      val m = w.map(_.abs).max
      if (m.signum > 0) v = w.map(x => x * 1000000 / m) // BigInt / truncates toward 0
    }
    import spark.implicits._
    v.zipWithIndex
      .map { case (x, i0) => ((i0 + 1).toLong, x.toLong) }.toSeq
      .toDF("i", "v")
      .orderBy(col("i"))
  }

  /** Catalog base of [[powerLifecycle]]'s Gramian-partials epoch family. */
  private[graft] def gramLifecycleBase(sfDir: String): String =
    "graft_gramlc_" + Layout.corpusTag(sfDir)

  /** Stream ≡ batch LIFECYCLE #16 — INCREMENTAL GRAMIAN MAINTENANCE,
    * the streaming-PCA story: a second-moment matrix is exactly
    * maintainable under appends because `dot(i,j) = Σ_v m_i·m_j` is
    * additive over any partition of the vector set. Even vec_ids
    * bulk-build a partials epoch (one shot of [[gramPartialsOf]]); the
    * odd half replays as a parquet-source stream through
    * [[graft.streaming.VectorStream.appendGramStream]] — per batch ONE
    * 2080-row delta partial appended, NO streaming state store (the
    * q_mv_lifecycle shape applied to the embedding pipeline). Serving
    * re-aggregates the partial-row SET to the full Gramian and runs
    * the UNCHANGED [[powerIterationFrom]] under the VERBATIM
    * [[powerIterationSql]] oracle — the driver hash proves bulk build
    * + streamed deltas ≡ the one-pass reduction digit for digit.
    * Rotates a fresh epoch per call, prunes to two.
    */
  def powerLifecycle(spark: SparkSession, sfDir: String): DataFrame = {
    val base = gramLifecycleBase(sfDir)
    val e = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    val t = Layout.rotateEpoch(spark, base) { name =>
      gramPartialsOf(e.filter(col("vec_id") % 2 === 0))
        .write.format("parquet").mode("overwrite").saveAsTable(name)
    }
    val odd = e.filter(col("vec_id") % 2 =!= 0)
    Layout.withStagedParquet(odd.repartition(4), "graft-gramlc") { dir =>
      val stream = graft.streaming.VectorStream.appendGramStream(
        spark.readStream.schema(odd.schema)
          .option("maxFilesPerTrigger", 2).parquet(dir), t)
      try stream.processAllAvailable() finally stream.stop()
    }
    Layout.pruneEpochs(spark, base, keep = 2)
    powerIterationFrom(spark,
      spark.table(t).groupBy(col("i"), col("j"))
        .agg(sum(col("dot")).cast("decimal(38,0)").as("dot")))
  }

  /** Oracle: the covariance Gramian CTEs + every power step as chained
    * CTEs — `//` is DuckDB's truncate-toward-zero integer division,
    * matching BigInt exactly. */
  val powerIterationSql: String = {
    val steps = (1 to PowerIters).map { t =>
      s"""w$t AS (
         |  SELECT g.i, SUM(g.dot * v${t - 1}.v) AS w
         |  FROM g JOIN v${t - 1} ON v${t - 1}.i = g.j GROUP BY 1
         |), m$t AS (SELECT MAX(ABS(w)) AS m FROM w$t),
         |v$t AS (
         |  SELECT i, (w * 1000000) // m AS v FROM w$t, m$t
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH mm AS (
       |  SELECT vec_id, CAST(t.i AS BIGINT) AS i,
       |    CAST(FLOOR(CAST(embedding[t.i] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS m
       |  FROM embeddings, range(1, 65) t(i)
       |), s AS (
       |  SELECT a.i AS i, b.i AS j, SUM(CAST(a.m AS HUGEINT) * b.m) AS dot
       |  FROM mm a JOIN mm b ON a.vec_id = b.vec_id AND a.i <= b.i
       |  GROUP BY 1, 2
       |), g AS (
       |  SELECT i, j, dot FROM s
       |  UNION ALL
       |  SELECT j AS i, i AS j, dot FROM s WHERE i <> j
       |), v0 AS (
       |  SELECT DISTINCT i, CAST(1000000 AS HUGEINT) AS v FROM g
       |), $steps
       |SELECT i, CAST(v AS BIGINT) AS v FROM v$PowerIters
       |ORDER BY i""".stripMargin
  }

  /** Johnson-Lindenstrauss random projection — the dimensionality
    * reduction a 100 TB embedding pipeline runs BEFORE clustering or
    * coarse ANN (Achlioptas '01: a ±1 sign matrix preserves pairwise
    * distances in expectation as well as Gaussian projections and costs
    * only adds). 64-D float → [[ProjDims]]-D exact integer micros:
    * component i of output dim j is `floor(emb[i]·1e6) · sign(i,j)`
    * with sign(i,j) = parity of the first hex char of md5("i|j"),
    * materialized ONCE in [[projSigns]] and consumed as LITERALS by
    * both engines. Round-11 lesson: the earlier form had each engine
    * evaluate the md5→substring→ascii→%2 chain itself (Catalyst
    * constant-folded its side, DuckDB ran its own md5) — that is
    * engine-version-sensitive by construction, and the adjudicating
    * oracle host disagreed on one link of the chain while three local
    * engines agreed. Shared literals close the whole drift class: the
    * oracle SQL is now pure ±term arithmetic with no hash, string, or
    * lambda functions at all.
    *
    * Plan: entirely ROW-LOCAL — 512 multiply-adds per row inside
    * whole-stage codegen, no shuffle anywhere before the presentation
    * sort. This is the 100 TB shape: dimensionality reduction is a map,
    * and anything that shuffles to project has already lost.
    */
  val ProjDims = 8

  /** The 64×[[ProjDims]] ±1 sign matrix, generated once from the
    * md5-parity rule. `projSigns(j)(i-1)` is sign(i,j) for embedding
    * component i ∈ [1,64], output dim j ∈ [0,ProjDims).
    */
  private[graft] val projSigns: IndexedSeq[IndexedSeq[Long]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until ProjDims).map { j =>
      (1 to 64).map { i =>
        val hex = md.digest(s"$i|$j".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        if (hex.charAt(0).toInt % 2 == 0) 1L else -1L
      }
    }
  }

  def randomProjection(spark: SparkSession, sfDir: String): DataFrame = {
    val dims = (0 until ProjDims).map { j =>
      (1 to 64).map { i =>
        // explicit double BEFORE the multiply: float*int would stay in
        // float precision in Spark while DuckDB promotes to double
        floor(element_at(col("embedding"), i).cast("double") * lit(1000000L))
          .cast("long") * lit(projSigns(j)(i - 1))
      }.reduce(_ + _).as(s"p$j")
    }
    Tables.embeddingsFanned(spark, sfDir)
      .select(col("vec_id") +: dims: _*)
      .orderBy(col("vec_id"))
  }

  /** Oracle twin: the same 512 terms written out as explicit signed
    * arithmetic — `± CAST(floor(CAST(embedding[i] AS DOUBLE)*1e6) AS
    * BIGINT)` — so the oracle engine only parses numbers, casts, floor,
    * and addition. Deliberately verbose: every function here is bedrock
    * ANSI SQL with one portable semantic, which is the point.
    */
  val randomProjectionSql: String = {
    val cols = (0 until ProjDims).map { j =>
      (1 to 64).map { i =>
        val op = if (projSigns(j)(i - 1) == 1L) "+" else "-"
        s"$op CAST(floor(CAST(embedding[$i] AS DOUBLE) * 1000000) AS BIGINT)"
      }.mkString("  (0\n    ", "\n    ", s"\n  ) AS p$j")
    }.mkString(",\n")
    s"""SELECT vec_id,
       |$cols
       |FROM embeddings
       |ORDER BY vec_id""".stripMargin
  }

  /** ANN via sign-LSH (random hyperplanes): bucket = sign bits of dot
    * products with `nPlanes` seeded pseudo-random hyperplanes; then exact
    * cosine top-k *within* the query vector's bucket. One shuffle on the
    * bucket key; at 100 TB each bucket is a tiny fraction of the corpus
    * and queries only touch their own bucket's partitions.
    *
    * Hyperplane components are deterministic pseudo-randoms derived from
    * (plane, dim) via a hash — reproducible with no RNG state, and
    * computable identically in the DuckDB oracle.
    */
  /** Deterministic ±1 hyperplane weights from (plane, dim idx) — no RNG
    * state, identically re-derivable in any engine.
    */
  def planeWeights(p: Int, dim: Int): Seq[Double] =
    (0 until dim).map(i =>
      if (((p * 1315423911L + i * 2654435761L) >>> 16 & 1L) == 1L) 1.0 else -1.0)

  def annBucket(emb: Column, nPlanes: Int, dim: Int): Column = {
    val bits = (0 until nPlanes).map { p =>
      val d = aggregate(
        zip_with(emb, typedLit(planeWeights(p, dim)), (x, w) => x.cast("double") * w),
        lit(0.0), (acc, v) => acc + v)
      when(d >= 0, lit("1")).otherwise(lit("0"))
    }
    concat(bits: _*)
  }

  /** Candidate-set ANN: all vectors sharing the query's LSH bucket,
    * exact-scored and top-10'd. (8 planes / 64 dims.)
    */
  def annLshTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val nPlanes = 8; val dim = 64
    val e = Tables.embeddingsFanned(spark, sfDir)
      .select(col("vec_id"), col("embedding"),
        annBucket(col("embedding"), nPlanes, dim).as("bucket"))
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("q_embedding"), col("bucket").as("q_bucket"))
    e.filter(col("vec_id") =!= 0)
      .join(broadcast(q), col("bucket") === col("q_bucket"))
      .select(col("vec_id"),
        round(cosine(col("embedding"), col("q_embedding")), 4).as("score"))
      .orderBy(col("score").desc, col("vec_id"))
      .limit(10)
  }

  /** Embedding-cosine near-duplicate pairs: all (a < b) vector pairs
    * with cosine ≥ 0.4, scored by the fused native expression inside a
    * broadcast nested-loop self-join. Scores rounded to 4 decimals in
    * output AND sort key (cross-engine FP-noise immunity, as knnCosine).
    *
    * Scale: brute force is O(n²·d) — right up to ~10⁵ vectors per
    * executor-broadcast; beyond that, pre-bucket with sign-LSH
    * ([[annBucket]]) or IVF cells ([[ivfTopK]]) and run this within
    * buckets: same scoring code, one shuffle on the bucket key.
    */
  def embeddingNearDup(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddingsFanned(spark, sfDir).select(col("vec_id"), col("embedding"))
    val a = e.as("a"); val b = e.as("b")
    a.join(broadcast(b), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        round(cosine(col("a.embedding"), col("b.embedding")), 4).as("score"))
      .filter(col("score") >= 0.4)
      .orderBy(col("vec_a"), col("vec_b"))
  }

  val embeddingNearDupSql: String =
    """WITH x AS (
      |  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
      |         generate_subscripts(embedding, 1) AS i
      |  FROM embeddings
      |), p AS (
      |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
      |    ROUND(SUM(a.v*b.v) / (SQRT(SUM(a.v*a.v)) * SQRT(SUM(b.v*b.v))), 4) AS score
      |  FROM x a JOIN x b ON a.i = b.i AND a.vec_id < b.vec_id
      |  GROUP BY 1, 2
      |)
      |SELECT vec_a, vec_b, score FROM p
      |WHERE score >= 0.4
      |ORDER BY vec_a, vec_b""".stripMargin

  /** IVF (inverted-file) ANN: vectors with vec_id 1..16 double as the
    * coarse quantizer's centroids (deterministic "training" — at scale
    * you'd k-means a sample and broadcast the result; the cell-routing
    * plumbing is identical). Every vector is assigned to its best cell
    * by cosine (rank ties broken by centroid id); query vec 0 probes its
    * nprobe=2 best cells and exact-scores only those cells' members.
    * Assignment ranks use round(cos, 6) so the cross-engine compare
    * cannot flip a near-tie cell choice.
    */
  /** The 16-row coarse-quantizer codebook (vectors 1..16 double as the
    * deterministic "trained" centroids — see [[ivfTopK]] scaladoc). */
  private def ivfCentroids(e: DataFrame): DataFrame =
    e.filter(col("vec_id").between(1, 16))
      .select(col("vec_id").as("cid"), col("embedding").as("cemb"))

  /** Every vector of `e` scored against the broadcast codebook and
    * ranked per vector (rn=1 is its assigned cell). Shared by the
    * in-flight [[ivfTopK]], the index build ([[ensureIvfIndex]]), and
    * the persisted probe's query-side cell ranking.
    */
  private def ivfRanked(e: DataFrame, cents: DataFrame): DataFrame = {
    val scored = e.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("embedding"), col("cid"),
        round(cosine(col("embedding"), col("cemb")), 6).as("ccos"))
    val byVec = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("ccos").desc, col("cid"))
    scored.withColumn("rn", row_number().over(byVec))
  }

  def ivfTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val nProbe = 2
    val e = Tables.embeddingsFanned(spark, sfDir).select(col("vec_id"), col("embedding"))
    val ranked = ivfRanked(e, ivfCentroids(e))
    val cells = ranked.filter(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("cid").as("cell"))
    val probes = ranked.filter(col("vec_id") === 0 && col("rn") <= nProbe)
      .select(col("cid").as("cell"))
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("q_embedding"))
    cells.filter(col("vec_id") =!= 0)
      .join(broadcast(probes), "cell")
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(cosine(col("embedding"), col("q_embedding")), 4).as("score"))
      .orderBy(col("score").desc, col("vec_id"))
      .limit(10)
  }

  /** Catalog name of the persisted IVF cell-assignment index for one
    * corpus directory (per-corpus so sf0.01 and sf0.1 never collide). */
  private[graft] def ivfIndexName(sfDir: String): String =
    "graft_ivf_idx_" + Layout.corpusTag(sfDir)

  private[graft] val IvfIndexBuckets = 16

  /** Build-once half of the production vector-store shape: materialize
    * the cell assignment (vec_id, embedding, cell) as a parquet table
    * BUCKETED BY cell ([[Layout.writeBucketed]]), so every later probe
    * reads only its nprobe cells' buckets — no shuffle, no full scan.
    * Idempotent per session; a leftover location from a dead session
    * (the in-memory catalog forgets tables at session end, the files
    * remain) is cleared before rebuilding. At 100 TB this is the
    * index-build job a vector store runs nightly: one assignment pass +
    * one bucketed write, amortized over every query after it.
    */
  def ensureIvfIndex(spark: SparkSession, sfDir: String): String =
    // bucket pruning on the probe's IN(cell, …) filter only applies
    // while the scan stays bucketed — Layout.ensureTable pins it
    Layout.ensureEpochIndex(spark, ivfIndexName(sfDir)) { name =>
      val e = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
      val cells = ivfRanked(e, ivfCentroids(e)).filter(col("rn") === 1)
        .select(col("vec_id"), col("embedding"), col("cid").as("cell"))
      Layout.writeBucketed(cells, name, "cell", IvfIndexBuckets)
    }

  /** Query-many half: top-k as an exchange-free PROBE of the stored
    * index. The query vector ranks against the broadcast codebook and
    * its nprobe cell ids collect to the driver (O(nprobe) rows — same
    * collect-small-state pattern as the codebook itself) so the index
    * scan can prune on LITERAL cell values: with the table bucketed by
    * cell, the scan reads nprobe of [[IvfIndexBuckets]] buckets
    * (`SelectedBucketsCount` in the plan, spec-asserted) and the whole
    * probe plans scan → filter → broadcast-score → TakeOrderedAndProject
    * with zero shuffle exchanges. Results are identical to [[ivfTopK]]
    * (same oracle); only WHEN the assignment work happens differs.
    */
  /** Shared probe: rank the query vector against `cents`, collect its
    * nprobe cell ids (O(nprobe) rows), and answer top-k from the
    * bucket-pruned index scan. Both persisted-index variants route
    * through here, so the probe semantics cannot drift between them.
    */
  private def probeIvfIndex(spark: SparkSession, table: String,
      cents: DataFrame, e: DataFrame, nProbe: Int): DataFrame = {
    val probeCells = ivfRanked(e.filter(col("vec_id") === 0), cents)
      .filter(col("rn") <= nProbe)
      .select(col("cid")).collect().map(_.getLong(0))
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("q_embedding"))
    spark.table(table)
      .filter(col("cell").isin(probeCells.map(Long.box): _*) && col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(cosine(col("embedding"), col("q_embedding")), 4).as("score"))
      .orderBy(col("score").desc, col("vec_id"))
      .limit(10)
  }

  def ivfPersistedTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val name = ensureIvfIndex(spark, sfDir)
    val e = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    probeIvfIndex(spark, name, ivfCentroids(e), e, nProbe = 2)
  }

  /** HARD-NEGATIVE mining for contrastive training — the DPR/ANCE
    * recipe run as a batch operator: for each anchor in a deterministic
    * 1% sample (vec_id ≡ 1 mod 100), the top-3 SAME-CELL neighbors
    * whose cosine falls in the HARD band [0.1, 0.9) — similar enough to
    * be informative negatives (random pairs of these embeddings
    * concentrate near 0), but below the near-duplicate threshold that
    * would make them FALSE negatives (the classic hard-negative-mining
    * failure mode). Retriever/reranker training consumes exactly this
    * (anchor, negative) table.
    *
    * Scale shape: BOTH join sides read the persisted cell-bucketed IVF
    * index on its bucket key — co-located, no exchange below the join
    * (the q_minhash_persisted precedent) — so the quadratic work is
    * confined within cells, and only for the 1% anchor sample: the
    * pair budget is sampleRate · Σ|cell|², two orders under
    * [[semanticDedup]]'s gated full self-join. Scoring is the fused
    * native cosine; per-anchor top-3 is a partitioned
    * WindowGroupLimit-pruned window. Anchors in singleton cells yield
    * nothing by construction — production mines from nprobe > 1 cells
    * when coverage matters.
    */
  def hardNegatives(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val name = ensureIvfIndex(spark, sfDir)
    val idx = spark.table(name)
    val anchors = idx.filter(col("vec_id") % 100 === 1)
      .select(col("cell"), col("vec_id").as("anchor_id"),
        col("embedding").as("a_emb"))
    val cands = idx.select(col("cell"), col("vec_id").as("neg_id"),
      col("embedding").as("c_emb"))
    val scored = anchors.join(cands, Seq("cell"))
      .filter(col("neg_id") =!= col("anchor_id"))
      .select(col("anchor_id"), col("neg_id"),
        round(cosine(col("a_emb"), col("c_emb")), 4).as("score"))
      .filter(col("score") >= 0.1 && col("score") < 0.9)
    val w = Window.partitionBy(col("anchor_id"))
      .orderBy(col("score").desc, col("neg_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select(col("anchor_id"), col("rank"), col("neg_id"), col("score"))
      .orderBy(col("anchor_id"), col("rank"))
  }

  /** Oracle: replay the cell assignment ([[ivfTopKSql]]'s CTEs), score
    * same-cell anchor pairs, band, rank — one statement. */
  val hardNegativesSql: String =
    """WITH x AS (
      |  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
      |         generate_subscripts(embedding, 1) AS i
      |  FROM embeddings
      |), c AS (
      |  SELECT vec_id AS cid, v AS cv, i FROM x WHERE vec_id BETWEEN 1 AND 16
      |), scored AS (
      |  SELECT x.vec_id, c.cid,
      |    ROUND(SUM(x.v*c.cv) / (SQRT(SUM(x.v*x.v)) * SQRT(SUM(c.cv*c.cv))), 6) AS ccos
      |  FROM x JOIN c ON x.i = c.i
      |  GROUP BY 1, 2
      |), ranked AS (
      |  SELECT vec_id, cid,
      |    row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rn
      |  FROM scored
      |), cells AS (
      |  SELECT vec_id, cid AS cell FROM ranked WHERE rn = 1
      |), pairs AS (
      |  SELECT a.vec_id AS anchor_id, b.vec_id AS neg_id,
      |    ROUND(SUM(xa.v*xb.v) / (SQRT(SUM(xa.v*xa.v)) * SQRT(SUM(xb.v*xb.v))), 4) AS score
      |  FROM cells a
      |  JOIN cells b ON a.cell = b.cell AND b.vec_id <> a.vec_id
      |  JOIN x xa ON xa.vec_id = a.vec_id
      |  JOIN x xb ON xb.vec_id = b.vec_id AND xb.i = xa.i
      |  WHERE a.vec_id % 100 = 1
      |  GROUP BY 1, 2
      |), banded AS (
      |  SELECT * FROM pairs WHERE score >= 0.1 AND score < 0.9
      |), r AS (
      |  SELECT anchor_id, neg_id, score,
      |    CAST(row_number() OVER (PARTITION BY anchor_id
      |      ORDER BY score DESC, neg_id) AS BIGINT) AS rank
      |  FROM banded
      |)
      |SELECT anchor_id, rank, neg_id, score FROM r WHERE rank <= 3
      |ORDER BY anchor_id, rank""".stripMargin

  /** Distributed spherical k-means training for the IVF coarse quantizer
    * — the "real index build" [[ivfTopK]]'s scaladoc defers to. Lloyd's
    * iterations, fully declarative and unrolled into one DAG:
    *
    *  - **assign**: every vector scores against the broadcast k-row
    *    codebook (the native fused cosine), argmax by
    *    `row_number() over (partition by vec_id order by ccos desc, cid)`
    *    on a NARROW (vec_id, cid, ccos) frame — embeddings never ride
    *    the window shuffle;
    *  - **update**: pre-exploded components join the assignment and
    *    partial-agg a per-(cell, dim) mean. The sum runs in
    *    `decimal(27,10)` — exact, order-independent — so both engines
    *    produce bit-identical centroids regardless of partitioning;
    *    cosine for ASSIGNMENT needs no centroid normalization (argmax
    *    over cosine is scale-invariant in the centroid), which is what
    *    makes plain means correct for spherical k-means.
    *
    * Deterministic seeding (vectors 1..k), fixed iteration count, and
    * per-step rounding to 6 decimals keep the whole training loop
    * oracle-checkable in DuckDB — an unusual property for an ML
    * training job, and exactly why the update avoids FP accumulation.
    * Accepted-risk note: cross-engine equality of the ASSIGNMENT step
    * relies on `round(ccos, 6)` absorbing FP summation-order differences
    * (Spark's sequential fused loop vs DuckDB's unordered SUM over join
    * rows). A dot product landing within ~1e-13 of a rounding boundary
    * could flip the rounded value, hence an argmax, hence a centroid —
    * never observed across sf0.001/0.01/0.1; if flakiness appears,
    * compute the Spark-side assignment cosine from the same exploded
    * frame (`ex`) as the update so both engines share one operand set.
    * At 100 TB you train on a sample (k-means cost is per-row·k), then
    * broadcast this codebook to route the full corpus — the routing is
    * [[ivfTopK]]'s cell assignment, unchanged.
    */
  def ivfKmeans(spark: SparkSession, sfDir: String): DataFrame = {
    val k = 8
    val iters = 2
    val e = Tables.embeddingsFanned(spark, sfDir)
      .select(col("vec_id"), col("embedding")).corpusCheckpoint()
    // 1-based dim index matches DuckDB's generate_subscripts
    val ex = e.select(col("vec_id"), posexplode(col("embedding")))
      .select(col("vec_id"), (col("pos") + 1).as("i"), col("col").cast("double").as("v"))
      .corpusCheckpoint()
    var cents = e.filter(col("vec_id").between(1, k))
      .select(col("vec_id").as("cid"),
        col("embedding").cast("array<double>").as("cemb"))
    for (_ <- 1 to iters) {
      val scored = e.crossJoin(broadcast(cents))
        .select(col("vec_id"), col("cid"),
          round(cosine(col("embedding"), col("cemb")), 6).as("ccos"))
      val byVec = org.apache.spark.sql.expressions.Window
        .partitionBy(col("vec_id")).orderBy(col("ccos").desc, col("cid"))
      val assign = scored.withColumn("rn", row_number().over(byVec))
        .filter(col("rn") === 1).select(col("vec_id"), col("cid").as("cell"))
      cents = ex.join(assign, "vec_id")
        .groupBy(col("cell"), col("i"))
        .agg((sum(col("v").cast("decimal(27,10)")).cast("double")
          / count(lit(1))).as("cv_raw"))
        .select(col("cell"), col("i"), round(col("cv_raw"), 6).as("cv"))
        .groupBy(col("cell").as("cid"))
        .agg(array_sort(collect_list(struct(col("i"), col("cv")))).as("pairs"))
        .select(col("cid"),
          transform(col("pairs"), s => s.getField("cv")).as("cemb"))
    }
    cents.select(col("cid"), posexplode(col("cemb")))
      .select(col("cid"), (col("pos") + 1).as("i"), col("col").as("comp"))
      .orderBy(col("cid"), col("i"))
  }

  /** Shared oracle CTE chain for the two trained-codebook oracles:
    * exploded components `x`, seed codebook `c1`, and two unrolled
    * Lloyd's iterations ending in the trained codebook `c3`. Declared
    * BEFORE every val that interpolates it (object vals initialize in
    * declaration order).
    */
  private val ivfKmeansCtes: String = {
    def iter(n: Int): String =
      s"""s$n AS (
         |  SELECT x.vec_id, c.cid,
         |    ROUND(SUM(x.v*c.cv) / (SQRT(SUM(x.v*x.v)) * SQRT(SUM(c.cv*c.cv))), 6) AS ccos
         |  FROM x JOIN c$n c ON x.i = c.i
         |  GROUP BY 1, 2
         |), a$n AS (
         |  SELECT vec_id, cid AS cell FROM (
         |    SELECT vec_id, cid,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rn
         |    FROM s$n) WHERE rn = 1
         |), c${n + 1} AS (
         |  SELECT a.cell AS cid, x.i,
         |    ROUND(CAST(SUM(CAST(x.v AS DECIMAL(27,10))) AS DOUBLE) / COUNT(*), 6) AS cv
         |  FROM x JOIN a$n a ON x.vec_id = a.vec_id
         |  GROUP BY 1, 2
         |)""".stripMargin
    s"""x AS (
       |  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
       |         generate_subscripts(embedding, 1) AS i
       |  FROM embeddings
       |), c1 AS (
       |  SELECT vec_id AS cid, i, v AS cv FROM x WHERE vec_id BETWEEN 1 AND 8
       |), ${iter(1)}, ${iter(2)}""".stripMargin
  }

  /** DuckDB form: the same two Lloyd's iterations unrolled as CTEs. */
  val ivfKmeansSql: String =
    s"""WITH $ivfKmeansCtes
       |SELECT cid, i, cv AS comp FROM c3
       |ORDER BY cid, i""".stripMargin

  /** [[ivfKmeansCtes]] extended through assignment: route every vector
    * to its best TRAINED centroid (`cells`), keeping the full ranking
    * (`ranked`) for probe-side consumers. Shared by
    * [[ivfTrainedTopKSql]] and [[CurationOps.clusterBalanceSql]].
    */
  private[operators] val ivfAssignCtes: String =
    s"""$ivfKmeansCtes, scored AS (
       |  SELECT x.vec_id, c.cid,
       |    ROUND(SUM(x.v*c.cv) / (SQRT(SUM(x.v*x.v)) * SQRT(SUM(c.cv*c.cv))), 6) AS ccos
       |  FROM x JOIN c3 c ON x.i = c.i
       |  GROUP BY 1, 2
       |), ranked AS (
       |  SELECT vec_id, cid,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rn
       |  FROM scored
       |), cells AS (
       |  SELECT vec_id, cid AS cell FROM ranked WHERE rn = 1
       |)""".stripMargin

  /** [[ivfAssignCtes]] extended through the probe: the query's 2 best
    * cells, exact-scored candidates — the oracle for
    * [[ivfTrainedTopK]].
    */
  val ivfTrainedTopKSql: String =
    s"""WITH $ivfAssignCtes, probes AS (
       |  SELECT cid AS cell FROM ranked WHERE vec_id = 0 AND rn <= 2
       |), qx AS (SELECT v, i FROM x WHERE vec_id = 0),
       |cand AS (
       |  SELECT cells.vec_id FROM cells JOIN probes ON cells.cell = probes.cell
       |  WHERE cells.vec_id <> 0
       |), s AS (
       |  SELECT x.vec_id,
       |    ROUND(SUM(x.v*qx.v) / (SQRT(SUM(x.v*x.v)) * SQRT(SUM(qx.v*qx.v))), 4) AS score
       |  FROM x JOIN qx ON x.i = qx.i
       |  WHERE x.vec_id IN (SELECT vec_id FROM cand)
       |  GROUP BY 1
       |)
       |SELECT vec_id, score FROM s
       |ORDER BY score DESC, vec_id
       |LIMIT 10""".stripMargin

  /** The k-means output re-assembled into (cid, cemb: array<double>)
    * codebook rows — the broadcastable quantizer the routing stage
    * consumes. */
  private def trainedCodebook(spark: SparkSession, sfDir: String): DataFrame =
    ivfKmeans(spark, sfDir)
      .groupBy(col("cid"))
      .agg(array_sort(collect_list(struct(col("i"), col("comp")))).as("pairs"))
      .select(col("cid"),
        transform(col("pairs"), s => s.getField("comp")).as("cemb"))

  private[graft] val IvfTrainedBuckets = 8

  /** The COMPLETE production IVF lifecycle, persisted: TRAIN the coarse
    * quantizer on the corpus ([[ivfKmeans]] — at 100 TB, on a sample),
    * route every vector to its trained cell, and persist the
    * assignments bucketed by cell. [[ensureIvfIndex]]'s seed-vector
    * variant demonstrates the probe mechanics; this one runs the real
    * index build a vector store ships — and stays oracle-checkable
    * because the training itself is (decimal-exact means).
    *
    * ONE epoch family serves every trained-IVF consumer: this ensure
    * resolves [[annLifecycleIndexName]] — the same family
    * [[annLifecycle]] maintains through build+streamed-append. The
    * lifecycle's own stream ≡ batch gate is what LICENSES the sharing
    * (a streamed-appended epoch answers exactly like a one-shot
    * build), so the probe keys pay no second build of the same index;
    * a fresh environment one-shot-builds the family here, and a
    * lifecycle run simply rotates a newer epoch under the same name
    * (r14 verdict's lifecycle fixed-cost ask).
    */
  def ensureIvfTrainedIndex(spark: SparkSession, sfDir: String): String =
    // the codebook is an epoch SIDECAR: it versions with its assignments
    // (a probe must never mix epochs), and the ensure guard requires BOTH
    // tables — a lost codebook triggers a rebuild instead of failing the
    // probe's spark.table(name + "_codebook")
    Layout.ensureEpochIndex(spark, annLifecycleIndexName(sfDir),
        sidecars = Seq("_codebook")) { name =>
      // train ONCE; the codebook persists beside the assignments (it IS
      // part of the index — probes read it instead of retraining).
      buildVectorEpoch(spark, sfDir,
        Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding")))(name)
    }

  /** Top-k probe of the TRAINED persisted index — same exchange-free
    * bucket-pruned shape as [[ivfPersistedTopK]], but the cells come
    * from the k-means codebook, closing the train → persist → probe
    * loop under one oracle statement ([[ivfTrainedTopKSql]]).
    */
  def ivfTrainedTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val name = ensureIvfTrainedIndex(spark, sfDir)
    val e = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    probeIvfIndex(spark, name, spark.table(name + "_codebook"), e, nProbe = 2)
  }

  /** Catalog base of [[annLifecycle]]'s OWN epoch family — separate
    * from [[ivfTrainedIndexName]] so the lifecycle rebuild never races
    * the shared index [[ivfTrainedTopK]] probes. */
  private[graft] def annLifecycleIndexName(sfDir: String): String =
    "graft_ivf_lc_" + Layout.corpusTag(sfDir)

  /** The ANN-index LIFECYCLE under the oracle — the vector twin of
    * [[graft.operators.TextOps.searchLifecycle]]: build one epoch of
    * the trained-IVF index from HALF the vectors (even vec_ids; the
    * codebook trains on the full corpus exactly as
    * [[ensureIvfTrainedIndex]]'s build does), stream the odd half
    * through the REAL maintenance path ([[graft.streaming.VectorStream
    * .appendVectorsStream]] — Structured Streaming micro-batches
    * routing each arrival under the epoch's OWN codebook sidecar and
    * appending bucket-spec-preserving cell rows), then run the standard
    * bucket-pruned probe against the appended epoch. The oracle is
    * [[ivfTrainedTopKSql]] VERBATIM — the full-corpus
    * train → persist → probe replay — so the driver hash-match proves
    * the streamed index state is indistinguishable from a one-pass
    * build (VectorStreamSpec proves it in-process; this key puts the
    * claim in the per-round driver gate). Rotates a fresh epoch every
    * call (the build+append IS the operator) and prunes to two.
    */
  def annLifecycle(spark: SparkSession, sfDir: String): DataFrame = {
    val base = annLifecycleIndexName(sfDir)
    val e = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    val t = Layout.rotateEpoch(spark, base, sidecars = Seq("_codebook")) { name =>
      buildVectorEpoch(spark, sfDir, e.filter(col("vec_id") % 2 === 0))(name)
    }
    val odd = e.filter(col("vec_id") % 2 =!= 0)
    Layout.withStagedParquet(odd, "graft-veclc") { arrivals =>
      val stream = graft.streaming.VectorStream.appendVectorsStream(
        spark.readStream.schema(odd.schema).parquet(arrivals), base)
      try { stream.processAllAvailable() } finally { stream.stop() }
    }
    Layout.pruneEpochs(spark, base, keep = 2, sidecars = Seq("_codebook"))
    probeIndexWithCodebook(spark, t, e)
  }

  // ---------------------------------------------------------------------
  // Product quantization (Jégou et al., TPAMI 2011)
  // ---------------------------------------------------------------------

  private[graft] val PqSubspaces = 16  // m: 64 dims → 16 × 4-dim subspaces
  private[graft] val PqSubDim = 4
  private[graft] val PqCentroids = 64  // k per subspace → 16×6 bits/vector

  /** PQ compression + asymmetric-distance (ADC) top-k — the MEMORY
    * story of a 100 TB vector store: a 64-dim float vector (256 B)
    * compresses to m=16 sub-codes of k=64 centroids each (12 BYTES,
    * 21×), and queries never decompress — the query precomputes one
    * m×k distance table and every vector's approximate distance is m
    * table lookups. m/k chosen by measured recall on this corpus
    * (6/10 of the exact top-20 at 21× compression — the synthetic
    * embeddings are near-uniform, PQ's hostile case; clustered real
    * embeddings do far better at the same code size).
    *
    * Sub-codebooks here are SEEDED from vectors 1..64's sub-vectors
    * (the [[ensureIvfIndex]] convention — swap per-subspace
    * [[ivfKmeans]] in for trained ones; the encode/ADC mechanics are
    * unchanged). Exactness: components quantize to integer MICROS up
    * front (`floor(x·1e6 + 0.5)` — float→double is exact, and floor is
    * tie-convention-free so no engine's ROUND choice is on the hash
    * path), so every
    * subspace distance is an exact BIGINT sum of squares — encode
    * argmins, the ADC table, and the final score carry NO floating
    * point and NO rounding ambiguity anywhere (unlike the cosine
    * family's round(·,6) accepted risk).
    *
    * Scale shape: encode is row-local (m·k·subdim integer ops per
    * vector against the 2-D literal codebook, built as nested
    * higher-order folds so the expression tree stays constant-size),
    * the ADC table is a driver-computed m×k literal (the probe-side
    * collect-small-state pattern), and the top-k plans as
    * TakeOrderedAndProject — zero shuffles end to end. At 100 TB the
    * codes would persist like [[ensureIvfTrainedIndex]]'s assignments
    * (12 B/vector instead of 256 B) with this exact probe running
    * over the codes table.
    */
  def pqTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val (m, sub, k, topk) = (PqSubspaces, PqSubDim, PqCentroids, 10)
    val micros = transform(col("embedding"),
      x => floor(x.cast("double") * 1000000d + 0.5d).cast("long"))
    val e = Tables.embeddingsFanned(spark, sfDir)
      .select(col("vec_id"), micros.as("q"))
    // codebook + query vector in ONE bounded collect (65 rows of 64
    // longs), the same small-state pattern as the IVF probes
    val head = e.filter(col("vec_id").between(0, k))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    val cents: Array[Array[Long]] = (1 to k).map(c => head(c.toLong)).toArray
    val q0: Array[Long] = head(0L)
    // driver-side ADC table: dt(j)(c) = |q0_j − cent_c,j|² (exact longs)
    val dt: Array[Array[Long]] = Array.tabulate(m) { j =>
      Array.tabulate(k) { c =>
        (0 until sub).map { i =>
          val d = q0(j * sub + i) - cents(c)(j * sub + i); d * d
        }.sum
      }
    }
    val centLit = typedLit(cents.map(_.toSeq).toSeq)
    val dtLit = typedLit(dt.map(_.toSeq).toSeq)
    // row-local encode + score, one constant-size nested-HOF column:
    // fold subspaces; per subspace argmin (dist, c) over the literal
    // codebook; accumulate that code's ADC table entry
    val adc = aggregate(sequence(lit(0), lit(m - 1)), lit(0L), (acc, j) => {
      val dists = transform(sequence(lit(0), lit(k - 1)), c =>
        struct(
          aggregate(sequence(lit(0), lit(sub - 1)), lit(0L), (a2, i) => {
            val d = element_at(col("q"), j * lit(sub) + i + 1) -
              element_at(element_at(centLit, c + 1), j * lit(sub) + i + 1)
            a2 + d * d
          }).as("dist"),
          c.as("c")))
      acc + element_at(element_at(dtLit, j + 1),
        array_min(dists).getField("c") + 1)
    })
    e.filter(col("vec_id") =!= 0)
      .select(col("vec_id"), adc.as("adc_dist"))
      .orderBy(col("adc_dist"), col("vec_id"))
      .limit(topk)
  }

  val pqTopKSql: String =
    """WITH x AS (
      |  SELECT vec_id,
      |    CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS v,
      |    generate_subscripts(embedding, 1) AS i
      |  FROM embeddings
      |), c AS (
      |  SELECT vec_id AS cid, v AS cv, i FROM x WHERE vec_id BETWEEN 1 AND 64
      |), d AS (
      |  -- per (vector, subspace, centroid) exact integer distance
      |  SELECT x.vec_id, (x.i - 1) // 4 AS j, c.cid,
      |    SUM((x.v - c.cv) * (x.v - c.cv)) AS dist
      |  FROM x JOIN c ON x.i = c.i
      |  GROUP BY 1, 2, 3
      |), codes AS (
      |  SELECT vec_id, j, cid
      |  FROM (SELECT vec_id, j, cid,
      |          row_number() OVER (PARTITION BY vec_id, j
      |            ORDER BY dist, cid) AS rn
      |        FROM d WHERE vec_id <> 0)
      |  WHERE rn = 1
      |), dt AS (
      |  SELECT j, cid, dist FROM d WHERE vec_id = 0
      |)
      |SELECT codes.vec_id, CAST(SUM(dt.dist) AS BIGINT) AS adc_dist
      |FROM codes JOIN dt ON codes.j = dt.j AND codes.cid = dt.cid
      |GROUP BY codes.vec_id
      |ORDER BY adc_dist, vec_id
      |LIMIT 10""".stripMargin

  private[graft] val PqTrainIters = 2

  /** TRAINED product quantization — the seed-codebook [[pqTopK]]'s
    * production counterpart, mirroring how [[ivfTrainedTopK]] upgrades
    * [[ivfPersistedTopK]]: per-subspace Lloyd's k-means over the
    * integer-micro sub-vectors (assignment = exact BIGINT L2 argmin,
    * ties by centroid id; update = per-(subspace, cell, dim) mean under
    * an EXACT round-half-away-from-zero integer division — `(2s+n) div
    * (2n)` on the positive magnitude, negated back — so both engines
    * produce bit-identical centroids with no floating point anywhere;
    * an emptied cell keeps its previous centroid), two unrolled
    * iterations, then the same encode + ADC probe under the trained
    * books. One oracle statement replays train → encode → probe, so
    * the hash match covers the whole lifecycle.
    *
    * Scale shape: assignments run in the VECTORIZED join form — the
    * long-format (vec, dim, value) components join the broadcast
    * 4096-row codebook frame and hash-aggregate per (vector, subspace,
    * cell), with the argmin as a codegen'd min over (dist·k + c)
    * packed longs — because three full encode passes through the
    * interpreted nested-HOF form measured 20× slower than the
    * equivalent codegen'd aggregates (the HOF stays the right shape
    * for the SINGLE pass of [[pqTopK]], where it buys a zero-shuffle
    * plan; a native Catalyst expression like [[graft.functions
    * .CosineSimilarity]] would be the production path for both).
    * Per-iteration driver traffic is the 4096-row codebook, exactly
    * like ivfKmeans — never O(corpus).
    *
    * Pass economics (round-9 re-plan, was 26% of the driver bench):
    * the whole lifecycle is THREE passes over the checkpointed
    * components — one per Lloyd iteration (assignment distances and
    * the update sums now come out of the SAME aggregation: the 4
    * sub-vector components ride the distance groupBy as conditional
    * mins, so the old per-iteration join-back of comps onto codes is
    * gone) plus one final-book encode pass; the query-side ADC table
    * is rebuilt from the 64-row vec_id=0 slice instead of
    * localCheckpointing all N·m·k candidate distances.
    */
  def pqTrainedTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val (m, sub, k, topk) = (PqSubspaces, PqSubDim, PqCentroids, 10)
    import spark.implicits._
    val micros = transform(col("embedding"),
      x => floor(x.cast("double") * 1000000d + 0.5d).cast("long"))
    val comps = Tables.embeddingsFanned(spark, sfDir)
      .select(col("vec_id"), micros.as("q"))
      .select(col("vec_id"), posexplode(col("q")).as(Seq("i0", "v")))
      .select(col("vec_id"), (col("i0") / sub).cast("int").as("j"),
        col("i0"), col("v"))
      .corpusCheckpoint() // read by every assignment pass
    val cents = pqTrainBooks(spark, comps)
    def centsDf(cs: Array[Array[Long]]): DataFrame =
      cs.zipWithIndex.flatMap { case (vec, c) =>
        vec.zipWithIndex.map { case (cv, i0) => (i0 / sub, c, i0, cv) }
      }.toSeq.toDF("j", "c", "i0", "cv")
    val books = broadcast(centsDf(cents))
    // final-book encode: ONE pass over the corpus side
    val codes = comps.filter(col("vec_id") =!= 0).join(books, Seq("j", "i0"))
      .groupBy(col("vec_id"), col("j"), col("c"))
      .agg(sum((col("v") - col("cv")) * (col("v") - col("cv"))).as("dist"))
      .groupBy(col("vec_id"), col("j"))
      .agg(min(col("dist") * k + col("c")).as("key"))
      .select(col("vec_id"), col("j"), (col("key") % k).cast("int").as("c"))
    // query-side ADC table from the 64-row vec_id=0 slice — a tiny
    // subtree, so no need to materialize the full distance frame
    val dt = comps.filter(col("vec_id") === 0).join(books, Seq("j", "i0"))
      .groupBy(col("j"), col("c"))
      .agg(sum((col("v") - col("cv")) * (col("v") - col("cv"))).as("qdist"))
    codes.join(broadcast(dt), Seq("j", "c"))
      .groupBy(col("vec_id"))
      .agg(sum(col("qdist")).as("adc_dist"))
      .orderBy(col("adc_dist"), col("vec_id"))
      .limit(topk)
  }

  /** The training loop of [[pqTrainedTopK]], returning the trained
    * sub-codebooks (also the spec's hook for the quantization-error
    * witness). `comps` must carry (vec_id, j, i0, v) long-format
    * integer-micro components.
    */
  private[graft] def pqTrainBooks(spark: SparkSession,
      comps: DataFrame): Array[Array[Long]] = {
    import spark.implicits._
    val (m, sub, k) = (PqSubspaces, PqSubDim, PqCentroids)
    // seed books: vectors 1..64's sub-vectors (pqTopK's convention)
    val centRows = comps.filter(col("vec_id").between(1, k))
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getLong(3)))
    var cents: Array[Array[Long]] = {
      val byVec = centRows.groupBy(_._1)
      (1 to k).map { c =>
        val vec = new Array[Long](m * sub)
        byVec(c.toLong).foreach { case (_, i0, v) => vec(i0) = v }
        vec
      }.toArray
    }
    // exact round-half-away-from-zero of s/n in integers (mirrors the
    // oracle's CASE formula; positive operands make div == floor)
    def roundDiv(s: Long, n: Long): Long =
      if (s >= 0) (2 * s + n) / (2 * n) else -((-2 * s + n) / (2 * n))
    for (_ <- 1 to PqTrainIters) {
      val centsDf = cents.zipWithIndex.flatMap { case (vec, c) =>
        vec.zipWithIndex.map { case (cv, i0) => (i0 / sub, c, i0, cv) }
      }.toSeq.toDF("j", "c", "i0", "cv")
      // ONE pass folds assignment AND update: the 4 sub-vector
      // components ride the per-(vec, j, c) distance aggregation as
      // conditional mins (each (vec, j, c) group holds exactly one row
      // per in-subspace dim, and the components don't depend on c, so
      // min() just forwards them through both groupBys), the packed-min
      // argmin picks the cell, and the per-(cell, dim) sums aggregate
      // straight off the argmin rows — no join-back of comps onto
      // codes, still everything codegen'd hash aggregates. The collect
      // is ≤ m·k rows of (4 sums + count) = the codebook, never data.
      val dimCols = (0 until sub).map(d =>
        min(when(pmod(col("i0"), lit(sub)) === d, col("v"))).as(s"v$d"))
      val sums = comps.filter(col("vec_id") =!= 0)
        .join(broadcast(centsDf), Seq("j", "i0"))
        .groupBy(col("vec_id"), col("j"), col("c"))
        .agg(sum((col("v") - col("cv")) * (col("v") - col("cv"))).as("dist"),
          dimCols: _*)
        .groupBy(col("vec_id"), col("j"))
        .agg(min(col("dist") * k + col("c")).as("key"),
          (0 until sub).map(d => min(col(s"v$d")).as(s"v$d")): _*)
        .groupBy(col("j"), (col("key") % k).cast("int").as("c"))
        .agg(count(lit(1)).as("n"),
          (0 until sub).map(d => sum(col(s"v$d")).as(s"s$d")): _*)
        .collect()
        .flatMap { r =>
          val (j, c, n) = (r.getInt(0), r.getInt(1), r.getLong(2))
          (0 until sub).map(d => (j, c, j * sub + d) -> ((r.getLong(3 + d), n)))
        }.toMap
      cents = Array.tabulate(k) { c =>
        Array.tabulate(m * sub) { i0 =>
          sums.get((i0 / sub, c, i0))
            .map { case (s, n) => roundDiv(s, n) }
            .getOrElse(cents(c)(i0)) // emptied cell keeps its centroid
        }
      }
    }
    cents
  }

  val pqTrainedTopKSql: String = {
    def assign(prev: String, name: String): String =
      s"""${name}_d AS MATERIALIZED (
         |  SELECT x.vec_id, cb.j, cb.c,
         |    SUM((x.v - cb.cv) * (x.v - cb.cv)) AS dist
         |  FROM x JOIN $prev cb ON cb.i = x.i
         |  GROUP BY 1, 2, 3
         |), $name AS MATERIALIZED (
         |  SELECT vec_id, j, c FROM (
         |    SELECT vec_id, j, c,
         |      row_number() OVER (PARTITION BY vec_id, j ORDER BY dist, c) AS rn
         |    FROM ${name}_d)
         |  WHERE rn = 1
         |)""".stripMargin
    def update(prevCb: String, asg: String, name: String): String =
      s"""$name AS MATERIALIZED (
         |  SELECT cb.j, cb.c, cb.i,
         |    COALESCE(CASE WHEN u.s IS NULL THEN NULL
         |      WHEN u.s >= 0 THEN (2 * u.s + u.n) // (2 * u.n)
         |      ELSE -((-2 * u.s + u.n) // (2 * u.n)) END, cb.cv) AS cv
         |  FROM $prevCb cb LEFT JOIN (
         |    SELECT a.j, a.c, x.i, SUM(x.v) AS s, COUNT(*) AS n
         |    FROM $asg a JOIN x ON x.vec_id = a.vec_id AND (x.i - 1) // 4 = a.j
         |    WHERE a.vec_id <> 0
         |    GROUP BY 1, 2, 3) u
         |  ON u.j = cb.j AND u.c = cb.c AND u.i = cb.i
         |)""".stripMargin
    s"""WITH x AS MATERIALIZED (
       |  SELECT vec_id,
       |    CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS v,
       |    generate_subscripts(embedding, 1) AS i
       |  FROM embeddings
       |), cb0 AS MATERIALIZED (
       |  SELECT (i - 1) // 4 AS j, vec_id - 1 AS c, i, v AS cv
       |  FROM x WHERE vec_id BETWEEN 1 AND 64
       |), ${assign("cb0", "a1")},
       |${update("cb0", "a1", "cb1")},
       |${assign("cb1", "a2")},
       |${update("cb1", "a2", "cb2")},
       |${assign("cb2", "codes")},
       |dt AS (
       |  SELECT j, c, dist FROM codes_d WHERE vec_id = 0
       |)
       |SELECT codes.vec_id, CAST(SUM(dt.dist) AS BIGINT) AS adc_dist
       |FROM codes JOIN dt ON codes.j = dt.j AND codes.c = dt.c
       |WHERE codes.vec_id <> 0
       |GROUP BY codes.vec_id
       |ORDER BY adc_dist, vec_id
       |LIMIT 10""".stripMargin
  }

  // ---------------------------------------------------------------------
  // IVF × PQ composed index (IVFADC — Jégou et al., TPAMI 2011 §IV)
  // ---------------------------------------------------------------------

  private[graft] val IvfPqCells = 16
  private[graft] val IvfPqNProbe = 2
  /** PQ books are seeded from the RESIDUALS of vectors 101..164 —
    * disjoint from the coarse seeds (1..16), and residuals rather than
    * raw vectors because that is what the books quantize. */
  private[graft] val IvfPqBookSeedFrom = 101

  /** Build-once half of the COMPOSED IVF×PQ index — the shape that
    * closes the last full-table-scan ANN path: [[ensureIvfIndex]]
    * prunes cells but stores raw 256 B vectors, [[pqTopK]] compresses
    * to 12 B codes but ADC-scans ALL of them; this index does both.
    * Every vector routes to its coarse cell (exact integer-micro L2
    * argmin over the 16-vector coarse codebook, ties by cid — the
    * micro quantization and packed-long argmin of [[pqTrainedTopK]]),
    * its RESIDUAL against that cell's centroid is PQ-encoded under
    * books shared across cells (the Faiss IVFADC layout), and the
    * (vec_id, cell, codes) rows persist BUCKETED BY CELL. Sidecars
    * `_coarse` and `_books` version with the epoch like the trained-IVF
    * codebook: a probe must never mix codebooks across epochs.
    *
    * At 100 TB this is the index that actually serves: storage is
    * m bytes/vector instead of 4·dim, and a probe reads nprobe of
    * [[IvfPqCells]] buckets of codes — cell pruning × 21× compression
    * in one scan. Everything stays in exact BIGINT arithmetic
    * (residuals of micros are micros), so the whole build→encode→probe
    * lifecycle remains oracle-checkable — no FP anywhere.
    *
    * Scale shape of the build: one broadcast-join + hash-agg pass per
    * stage (assignment, residuals, encode) over the long-format
    * components — all map-side-combinable aggregates, no windows, no
    * O(n²) anywhere; the only collects are the bounded codebook
    * sidecars at probe time.
    */
  /** Resolves [[ivfPqLifecycleIndexName]] — one epoch family for the
    * composed index, shared with [[ivfPqLifecycle]]'s streamed
    * maintenance exactly as [[ensureIvfTrainedIndex]] shares the
    * trained-IVF family (the lifecycle's stream ≡ batch gate licenses
    * it; fresh environments one-shot-build here). */
  def ensureIvfPqIndex(spark: SparkSession, sfDir: String): String =
    Layout.ensureEpochIndex(spark, ivfPqLifecycleIndexName(sfDir),
        sidecars = Seq("_coarse", "_books"))(
      buildIvfPqEpoch(spark, sfDir,
        Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))))

  /** Build one IVF×PQ epoch from an explicit vector frame — codebooks
    * seeded from the CORPUS (deterministic for any subset an epoch
    * indexes, the [[buildVectorEpoch]] convention), codes encoded from
    * `vectors`. This is the build half the streaming append composes
    * with: [[VectorStreamSpec]] proves a stream-appended epoch is
    * row-identical to a one-batch build.
    */
  private[graft] def buildIvfPqEpoch(spark: SparkSession, sfDir: String,
      vectors: DataFrame)(name: String): Unit =
    buildIvfPqEpochFrom(spark,
      Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding")),
      vectors)(name)

  /** [[buildIvfPqEpoch]] with an explicit CORPUS frame (codebook seed
    * source) instead of a catalog directory — the form CrossoverBench
    * drives over synthetic 10× corpora. */
  private[graft] def buildIvfPqEpochFrom(spark: SparkSession, corpus: DataFrame,
      vectors: DataFrame)(name: String): Unit = {
    writeIvfPqCodebooksFrom(spark, corpus, name)
    Layout.writeBucketed(encodeForIvfPqIndex(spark, name, vectors),
      name, "cell", IvfPqCells)
  }

  /** Corpus-seeded codebook sidecars of one IVF×PQ epoch: `_coarse` is
    * corpus vectors 1..nc in exact micros; `_books` are the RESIDUALS
    * of corpus vectors [[IvfPqBookSeedFrom]]..+k−1 against their own
    * coarse cells (the Faiss IVFADC convention — books quantize
    * residuals, so they are seeded from residuals).
    */
  private[graft] def writeIvfPqCodebooks(spark: SparkSession, sfDir: String,
      name: String): Unit =
    writeIvfPqCodebooksFrom(spark,
      Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding")),
      name)

  private[graft] def writeIvfPqCodebooksFrom(spark: SparkSession,
      corpus: DataFrame, name: String): Unit = {
    val (k, nc) = (PqCentroids, IvfPqCells)
    val micros = transform(col("embedding"),
      x => floor(x.cast("double") * 1000000d + 0.5d).cast("long"))
    val seedComps = corpus
      .filter(col("vec_id").between(1, nc) ||
        col("vec_id").between(IvfPqBookSeedFrom, IvfPqBookSeedFrom + k - 1))
      .select(col("vec_id"), posexplode(micros).as(Seq("i0", "v")))
      .localCheckpoint() // bounded: (nc+k)·dim component rows — recompute-safe; coarse sidecar + seed assignment + books read it
    def assemble(df: DataFrame, id: Column, v: Column, out: String) =
      df.groupBy(id.as("cid"))
        .agg(array_sort(collect_list(struct(col("i0"), v.as("v")))).as("p"))
        .select(col("cid"), transform(col("p"), s => s.getField("v")).as(out))
    val coarseComps = seedComps.filter(col("vec_id").between(1, nc))
      .select(col("vec_id").as("cell"), col("i0"), col("v").as("cv"))
    // book-seed residuals: assign each seed to its coarse cell (exact
    // integer L2, packed-long argmin — the same arithmetic the encode
    // uses), subtract that cell's centroid
    val bookSrc = seedComps.filter(
      col("vec_id").between(IvfPqBookSeedFrom, IvfPqBookSeedFrom + k - 1))
    val cellOf = bookSrc.join(broadcast(coarseComps), Seq("i0"))
      .groupBy(col("vec_id"), col("cell"))
      .agg(sum((col("v") - col("cv")) * (col("v") - col("cv"))).as("dist"))
      .groupBy(col("vec_id"))
      .agg(min(col("dist") * nc + (col("cell") - 1)).as("key"))
      .select(col("vec_id"), (col("key") % nc + 1).as("cell"))
    val rseed = bookSrc.join(cellOf, "vec_id")
      .join(broadcast(coarseComps), Seq("cell", "i0"))
      .select(col("vec_id"), col("i0"), (col("v") - col("cv")).as("rv"))
    // both sidecars derive from the checkpointed seedComps frame (the
    // books path reads coarseComps the FRAME, never the `_coarse`
    // table) — overlapped writes (guide §2.6)
    Layout.inParallel(
      // coarse codebook sidecar: vectors 1..nc in exact micros
      () => assemble(seedComps.filter(col("vec_id").between(1, nc)),
          col("vec_id"), col("v"), "cemb")
        .withColumnRenamed("cid", "cell")
        .write.format("parquet").mode("overwrite").saveAsTable(name + "_coarse"),
      () => assemble(rseed, (col("vec_id") - IvfPqBookSeedFrom).as("c"),
          col("rv"), "bemb")
        .withColumnRenamed("cid", "c")
        .write.format("parquet").mode("overwrite").saveAsTable(name + "_books"))
  }

  /** Encode vectors under an EXISTING epoch's codebook sidecars — the
    * IVF×PQ analog of [[assignToIndexCells]]: coarse-assign under the
    * epoch's `_coarse`, residual-encode under its `_books`, never a
    * retrained codebook (an append must follow the layout of the epoch
    * it lands in). Returns (vec_id, cell, codes) rows; the arithmetic
    * is bit-identical to the build's (exact integer micros, packed-long
    * argmins), so append-encoded rows are indistinguishable from built
    * ones — which is what makes stream ≡ batch provable.
    */
  private[graft] def encodeForIvfPqIndex(spark: SparkSession, name: String,
      vectors: DataFrame): DataFrame = {
    val (sub, k, nc) = (PqSubDim, PqCentroids, IvfPqCells)
    val micros = transform(col("embedding"),
      x => floor(x.cast("double") * 1000000d + 0.5d).cast("long"))
    val comps = vectors
      .select(col("vec_id"), posexplode(micros).as(Seq("i0", "v")))
      .corpusCheckpoint() // read by assignment and residual stages
    // the sidecar arrays are i0-sorted by construction, so posexplode
    // position IS the component index
    val coarseComps = spark.table(name + "_coarse")
      .select(col("cell"), posexplode(col("cemb")).as(Seq("i0", "cv")))
    // coarse assignment: exact integer L2, packed-long argmin
    val cellOf = comps.join(broadcast(coarseComps), Seq("i0"))
      .groupBy(col("vec_id"), col("cell"))
      .agg(sum((col("v") - col("cv")) * (col("v") - col("cv"))).as("dist"))
      .groupBy(col("vec_id"))
      .agg(min(col("dist") * nc + (col("cell") - 1)).as("key"))
      .select(col("vec_id"), (col("key") % nc + 1).as("cell"))
    // residual components: v − centroid(cell(v)), still exact micros
    val rcomps = comps.join(cellOf, "vec_id")
      .join(broadcast(coarseComps), Seq("cell", "i0"))
      .select(col("vec_id"), col("cell"), col("i0"),
        (col("v") - col("cv")).as("rv"))
    val bookComps = spark.table(name + "_books")
      .select(col("c"), posexplode(col("bemb")).as(Seq("i0", "bv")))
    // encode: per (vector, subspace) argmin over the k books
    rcomps.join(broadcast(bookComps), Seq("i0"))
      .groupBy(col("vec_id"), col("cell"),
        (col("i0") / sub).cast("int").as("j"), col("c"))
      .agg(sum((col("rv") - col("bv")) * (col("rv") - col("bv"))).as("dist"))
      .groupBy(col("vec_id"), col("cell"), col("j"))
      .agg(min(col("dist") * k + col("c")).as("key"))
      .groupBy(col("vec_id"), col("cell"))
      .agg(array_sort(collect_list(struct(col("j"),
        (col("key") % k).cast("int").as("c")))).as("p"))
      .select(col("vec_id"), col("cell"),
        transform(col("p"), s => s.getField("c")).as("codes"))
  }

  /** Append encoded codes into the epoch's bucketed table — same bucket
    * spec as the build, so bucket pruning keeps holding over the union
    * of build + appends (the [[appendToIvfIndex]] contract).
    */
  private[graft] def appendToIvfPqIndex(name: String, codes: DataFrame): Unit =
    codes.select(col("vec_id"), col("cell"), col("codes"))
      .write.format("parquet")
      .bucketBy(IvfPqCells, "cell").sortBy("cell")
      .mode("append").saveAsTable(name)

  /** Query-many half of the composed index: the query ranks cells on
    * the driver from the 16-row `_coarse` sidecar (bounded small state,
    * like every probe here), computes one ADC table PER PROBED CELL
    * over its cell-specific query residual (the part plain PQ doesn't
    * have), and answers from a bucket-pruned scan of the codes table:
    * scan nprobe of [[IvfPqCells]] buckets → row-local m-lookup fold →
    * TakeOrderedAndProject. Zero shuffle exchanges, zero raw vectors
    * read, spec-asserted like [[ivfPersistedTopK]].
    */
  def ivfPqTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val name = ensureIvfPqIndex(spark, sfDir)
    probeIvfPqIndex(spark, name, queryMicros(spark, sfDir))
  }

  private def queryMicros(spark: SparkSession, sfDir: String): Array[Long] =
    Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") === 0)
      .select(transform(col("embedding"),
        x => floor(x.cast("double") * 1000000d + 0.5d).cast("long")))
      .head().getSeq[Long](0).toArray

  /** Catalog base of [[ivfPqLifecycle]]'s OWN epoch family. */
  private[graft] def ivfPqLifecycleIndexName(sfDir: String): String =
    "graft_ivfpq_lc_" + Layout.corpusTag(sfDir)

  /** The COMPOSED-index lifecycle under the oracle — third of the
    * lifecycle trilogy ([[graft.operators.TextOps.searchLifecycle]],
    * [[annLifecycle]]): build one IVF×PQ epoch from the even half
    * (corpus-seeded `_coarse`/`_books` sidecars, exactly as
    * [[ensureIvfPqIndex]]'s build), stream the odd half through
    * [[graft.streaming.VectorStream.appendVectorsStreamIvfPq]] — each
    * micro-batch coarse-assigns + residual-PQ-encodes under the
    * epoch's OWN sidecars and appends 12 B/vector code rows bucketed
    * by cell — then run the standard nprobe ADC probe against the
    * appended epoch. Oracle = [[ivfPqTopKSql]] VERBATIM: the streamed
    * composed index must answer exactly like the one-pass build.
    */
  def ivfPqLifecycle(spark: SparkSession, sfDir: String): DataFrame = {
    val base = ivfPqLifecycleIndexName(sfDir)
    val e = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    val t = Layout.rotateEpoch(spark, base, sidecars = Seq("_coarse", "_books")) { name =>
      buildIvfPqEpoch(spark, sfDir, e.filter(col("vec_id") % 2 === 0))(name)
    }
    val odd = e.filter(col("vec_id") % 2 =!= 0)
    Layout.withStagedParquet(odd, "graft-pqlc") { arrivals =>
      val stream = graft.streaming.VectorStream.appendVectorsStreamIvfPq(
        spark.readStream.schema(odd.schema).parquet(arrivals), base)
      try { stream.processAllAvailable() } finally { stream.stop() }
    }
    Layout.pruneEpochs(spark, base, keep = 2, sidecars = Seq("_coarse", "_books"))
    probeIvfPqIndex(spark, t, queryMicros(spark, sfDir))
  }

  /** Probe any IVF×PQ epoch table by name with an exact-micro query
    * vector (the spec's entry point for stream-appended epochs;
    * [[ivfPqTopK]] is the corpus-keyed production wrapper).
    */
  private[graft] def probeIvfPqIndex(spark: SparkSession, name: String,
      q0: Array[Long], topk: Int = 10,
      nProbe: Int = IvfPqNProbe): DataFrame = {
    val (m, sub, k) = (PqSubspaces, PqSubDim, PqCentroids)
    val coarse: Map[Long, Array[Long]] = spark.table(name + "_coarse")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    val books: Array[Array[Long]] = spark.table(name + "_books")
      .orderBy(col("c")).collect().map(_.getSeq[Long](1).toArray)
    // driver-side cell ranking: exact integer L2, ties by cell id
    val probeCells: Seq[Long] = coarse.toSeq.map { case (cell, cemb) =>
      (cemb.indices.map { i => val d = q0(i) - cemb(i); d * d }.sum, cell)
    }.sorted.take(nProbe).map(_._2)
    // per-cell ADC tables over the cell-specific query residual
    val dt: Map[Long, Seq[Seq[Long]]] = probeCells.map { cell =>
      val cemb = coarse(cell)
      val rq = Array.tabulate(q0.length)(i => q0(i) - cemb(i))
      cell -> Seq.tabulate(m)(j => Seq.tabulate(k) { c =>
        (0 until sub).map { i =>
          val d = rq(j * sub + i) - books(c)(j * sub + i); d * d
        }.sum
      })
    }.toMap
    val dtLit = typedLit(dt)
    val adc = aggregate(sequence(lit(0), lit(m - 1)), lit(0L), (acc, j) =>
      acc + element_at(element_at(element_at(dtLit, col("cell")), j + 1),
        element_at(col("codes"), j + 1) + 1))
    spark.table(name)
      .filter(col("cell").isin(probeCells.map(Long.box): _*) &&
        col("vec_id") =!= 0)
      .select(col("vec_id"), adc.as("adc_dist"))
      .orderBy(col("adc_dist"), col("vec_id"))
      .limit(topk)
  }

  /** One oracle statement replaying the COMPLETE IVFADC lifecycle —
    * coarse assignment, residuals, book seeding, encode, cell-pruned
    * probe with per-cell ADC tables — in the exact-BIGINT arithmetic of
    * [[pqTopKSql]], so the hash match covers composition, not just the
    * probe.
    */
  val ivfPqTopKSql: String =
    s"""WITH x AS MATERIALIZED (
       |  SELECT vec_id,
       |    CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS v,
       |    generate_subscripts(embedding, 1) AS i
       |  FROM embeddings
       |), coarse AS (
       |  SELECT vec_id AS cell, i, v AS cv FROM x WHERE vec_id BETWEEN 1 AND $IvfPqCells
       |), cd AS MATERIALIZED (
       |  SELECT x.vec_id, c.cell, SUM((x.v - c.cv) * (x.v - c.cv)) AS dist
       |  FROM x JOIN coarse c ON c.i = x.i
       |  GROUP BY 1, 2
       |), cells AS MATERIALIZED (
       |  SELECT vec_id, cell FROM (
       |    SELECT vec_id, cell,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rn
       |    FROM cd)
       |  WHERE rn = 1
       |), r AS MATERIALIZED (
       |  SELECT x.vec_id, cells.cell, x.i, x.v - c.cv AS rv
       |  FROM x
       |  JOIN cells ON cells.vec_id = x.vec_id
       |  JOIN coarse c ON c.cell = cells.cell AND c.i = x.i
       |), books AS (
       |  SELECT vec_id - $IvfPqBookSeedFrom AS c, i, rv AS bv
       |  FROM r WHERE vec_id BETWEEN $IvfPqBookSeedFrom AND ${IvfPqBookSeedFrom + PqCentroids - 1}
       |), bd AS MATERIALIZED (
       |  SELECT r.vec_id, (r.i - 1) // $PqSubDim AS j, b.c,
       |    SUM((r.rv - b.bv) * (r.rv - b.bv)) AS dist
       |  FROM r JOIN books b ON b.i = r.i
       |  WHERE r.vec_id <> 0
       |  GROUP BY 1, 2, 3
       |), codes AS (
       |  SELECT vec_id, j, c FROM (
       |    SELECT vec_id, j, c,
       |      row_number() OVER (PARTITION BY vec_id, j ORDER BY dist, c) AS rn
       |    FROM bd)
       |  WHERE rn = 1
       |), probes AS (
       |  SELECT cell FROM (
       |    SELECT cell, row_number() OVER (ORDER BY dist, cell) AS rn
       |    FROM cd WHERE vec_id = 0)
       |  WHERE rn <= $IvfPqNProbe
       |), qr AS (
       |  -- the query's residual PER PROBED CELL (what plain PQ lacks)
       |  SELECT p.cell, x.i, x.v - c.cv AS rv
       |  FROM x
       |  CROSS JOIN probes p
       |  JOIN coarse c ON c.cell = p.cell AND c.i = x.i
       |  WHERE x.vec_id = 0
       |), dt AS (
       |  SELECT qr.cell, (qr.i - 1) // $PqSubDim AS j, b.c,
       |    SUM((qr.rv - b.bv) * (qr.rv - b.bv)) AS dist
       |  FROM qr JOIN books b ON b.i = qr.i
       |  GROUP BY 1, 2, 3
       |)
       |SELECT codes.vec_id, CAST(SUM(dt.dist) AS BIGINT) AS adc_dist
       |FROM codes
       |JOIN cells ON cells.vec_id = codes.vec_id
       |JOIN dt ON dt.cell = cells.cell AND dt.j = codes.j AND dt.c = codes.c
       |WHERE codes.vec_id <> 0
       |GROUP BY 1
       |ORDER BY adc_dist, codes.vec_id
       |LIMIT 10""".stripMargin

  /** Route NEW vectors to their cells under an existing epoch's OWN
    * codebook sidecar — the assignment half of an index append. The
    * codebook is read from the epoch, never retrained: an append must
    * agree with the epoch it lands in, or probes would read a cell
    * layout the routed vectors don't follow.
    */
  private[graft] def assignToIndexCells(spark: SparkSession, name: String,
      vectors: DataFrame): DataFrame =
    ivfRanked(vectors.select(col("vec_id"), col("embedding")),
        spark.table(name + "_codebook"))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("cid").as("cell"))

  /** Append routed cell assignments into the epoch's bucketed table —
    * same bucket spec as the build ([[ensureIvfTrainedIndex]]), so
    * bucket pruning keeps holding over the union of build + appends.
    */
  private[graft] def appendToIvfIndex(name: String, cells: DataFrame): Unit =
    cells.select(col("vec_id"), col("embedding"), col("cell"))
      .write.format("parquet")
      .bucketBy(IvfTrainedBuckets, "cell").sortBy("cell")
      .mode("append").saveAsTable(name)

  /** Probe any codebook-sidecar index family by name (the spec's
    * entry point for stream-appended epochs; [[ivfTrainedTopK]] is the
    * corpus-keyed production wrapper).
    */
  private[graft] def probeIndexWithCodebook(spark: SparkSession, name: String,
      e: DataFrame, nProbe: Int = 2): DataFrame =
    probeIvfIndex(spark, name, spark.table(name + "_codebook"), e, nProbe)

  /** Build one epoch of a vector-index family from an explicit vector
    * frame (codebook trained on the given corpus dir, assignments from
    * `vectors`) — the build half the streaming append composes with.
    */
  private[graft] def buildVectorEpoch(spark: SparkSession, sfDir: String,
      vectors: DataFrame)(name: String): Unit = {
    // bounded: k codebook rows — recompute-safe, stays local
    val cb = trainedCodebook(spark, sfDir).localCheckpoint()
    cb.write.format("parquet").mode("overwrite").saveAsTable(name + "_codebook")
    val cells = ivfRanked(vectors.select(col("vec_id"), col("embedding")), cb)
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("cid").as("cell"))
    Layout.writeBucketed(cells, name, "cell", IvfTrainedBuckets)
  }

  val ivfTopKSql: String =
    """WITH x AS (
      |  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
      |         generate_subscripts(embedding, 1) AS i
      |  FROM embeddings
      |), c AS (
      |  SELECT vec_id AS cid, v AS cv, i FROM x WHERE vec_id BETWEEN 1 AND 16
      |), scored AS (
      |  SELECT x.vec_id, c.cid,
      |    ROUND(SUM(x.v*c.cv) / (SQRT(SUM(x.v*x.v)) * SQRT(SUM(c.cv*c.cv))), 6) AS ccos
      |  FROM x JOIN c ON x.i = c.i
      |  GROUP BY 1, 2
      |), ranked AS (
      |  SELECT vec_id, cid,
      |    row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rn
      |  FROM scored
      |), cells AS (
      |  SELECT vec_id, cid AS cell FROM ranked WHERE rn = 1
      |), probes AS (
      |  SELECT cid AS cell FROM ranked WHERE vec_id = 0 AND rn <= 2
      |), qx AS (SELECT v, i FROM x WHERE vec_id = 0),
      |cand AS (
      |  SELECT cells.vec_id FROM cells JOIN probes ON cells.cell = probes.cell
      |  WHERE cells.vec_id <> 0
      |), s AS (
      |  SELECT x.vec_id,
      |    ROUND(SUM(x.v*qx.v) / (SQRT(SUM(x.v*x.v)) * SQRT(SUM(qx.v*qx.v))), 4) AS score
      |  FROM x JOIN qx ON x.i = qx.i
      |  WHERE x.vec_id IN (SELECT vec_id FROM cand)
      |  GROUP BY 1
      |)
      |SELECT vec_id, score FROM s
      |ORDER BY score DESC, vec_id
      |LIMIT 10""".stripMargin

  /** Shared oracle CTE chain — seeded ±1 hyperplanes as literal DOUBLE
    * lists (both engines evaluate the same constants), exploded
    * components `x`, and per-vector sign-LSH `b(vec_id, bucket)` — used
    * by [[annLshTopKSql]] and [[embeddingNearDupLshSql]].
    */
  private val lshBucketCtes: String = {
    val planeRows = (0 until 8).map { p =>
      s"($p, [${planeWeights(p, 64).map(w => if (w > 0) "1.0" else "-1.0").mkString(",")}]::DOUBLE[])"
    }.mkString(",\n  ")
    s"""planes(p, w) AS (VALUES
       |  $planeRows
       |), x AS (
       |  SELECT vec_id,
       |    CAST(unnest(embedding) AS DOUBLE) AS v,
       |    generate_subscripts(embedding, 1) AS i
       |  FROM embeddings
       |), b AS (
       |  SELECT vec_id,
       |    string_agg(CASE WHEN s >= 0 THEN '1' ELSE '0' END, '' ORDER BY p) AS bucket
       |  FROM (
       |    SELECT x.vec_id, planes.p, SUM(x.v * planes.w[x.i]) AS s
       |    FROM x, planes GROUP BY x.vec_id, planes.p)
       |  GROUP BY vec_id
       |)""".stripMargin
  }

  val annLshTopKSql: String = {
    s"""WITH $lshBucketCtes, e AS (
       |  SELECT emb.vec_id, emb.embedding, b.bucket
       |  FROM embeddings emb JOIN b ON emb.vec_id = b.vec_id
       |), q AS (SELECT embedding AS qe, bucket AS qb FROM e WHERE vec_id = 0),
       |cand AS (
       |  SELECT e.vec_id,
       |    CAST(unnest(e.embedding) AS DOUBLE) AS xx,
       |    CAST(unnest(q.qe) AS DOUBLE) AS yy
       |  FROM e, q WHERE e.vec_id <> 0 AND e.bucket = q.qb
       |), s AS (
       |  SELECT vec_id, SUM(xx*yy)/(SQRT(SUM(xx*xx))*SQRT(SUM(yy*yy))) AS score
       |  FROM cand GROUP BY vec_id
       |)
       |SELECT vec_id, ROUND(score, 4) AS score
       |FROM s ORDER BY ROUND(score, 4) DESC, vec_id LIMIT 10""".stripMargin
  }

  /** Embedding near-dup, LSH-BUCKETED — the 100 TB path
    * [[embeddingNearDup]]'s scaladoc defers to, as a first-class
    * operator: vectors shuffle ONCE on their 8-bit sign-LSH bucket and
    * pairwise cosine runs within buckets only, so the quadratic work is
    * n²/2ᵖ-ish per bucket instead of n² overall, and no side needs to
    * broadcast. Approximate by construction (a true pair split across
    * buckets is missed — the brute-force operator is the recall
    * baseline); the oracle mirrors the exact bucketing, so correctness
    * of the plumbing is still hash-checked.
    */
  def embeddingNearDupLsh(spark: SparkSession, sfDir: String): DataFrame = {
    val nPlanes = 8; val dim = 64
    // bucket signatures are interpreted-HOF work — compute once, reuse
    // on both self-join sides
    val e = Tables.embeddingsFanned(spark, sfDir)
      .select(col("vec_id"), col("embedding"),
        annBucket(col("embedding"), nPlanes, dim).as("bucket"))
      .corpusCheckpoint()
    val a = e.as("a"); val b = e.as("b")
    a.join(b,
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        round(cosine(col("a.embedding"), col("b.embedding")), 4).as("score"))
      .filter(col("score") >= 0.4)
      .orderBy(col("vec_a"), col("vec_b"))
  }

  val embeddingNearDupLshSql: String =
    s"""WITH $lshBucketCtes, pr AS (
       |  SELECT l.vec_id AS vec_a, r.vec_id AS vec_b
       |  FROM b l JOIN b r
       |    ON l.bucket = r.bucket AND l.vec_id < r.vec_id
       |), s AS (
       |  SELECT pr.vec_a, pr.vec_b,
       |    ROUND(SUM(xa.v*xb.v) / (SQRT(SUM(xa.v*xa.v)) * SQRT(SUM(xb.v*xb.v))), 4) AS score
       |  FROM pr
       |  JOIN x xa ON xa.vec_id = pr.vec_a
       |  JOIN x xb ON xb.vec_id = pr.vec_b AND xb.i = xa.i
       |  GROUP BY pr.vec_a, pr.vec_b
       |)
       |SELECT vec_a, vec_b, score FROM s
       |WHERE score >= 0.4
       |ORDER BY vec_a, vec_b""".stripMargin

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): cluster the embedding space with the coarse
    * quantizer, then drop near-duplicates ONLY within each cluster —
    * the quadratic pair cost falls from n² to Σ|cell|², and each
    * cell's pairwise pass is an independent co-located join. Reuses
    * the deterministic 16-centroid codebook convention of [[ivfTopK]]
    * (vec_id 1..16); at 100 TB you instead train k ∝ corpus-size /
    * target-cell-size centroids ([[ivfKmeans]]) so per-cell membership
    * stays bounded, and the within-cell self-join shuffles both sides
    * once on `cell` — sort-merge shape, nothing n-sized is broadcast.
    *
    * Drop rule (canonical-representative greedy): a vector is dropped
    * when ANY lower-id vector in its cell scores cosine ≥ 0.4 against
    * it; survivors therefore contain no qualifying pair, so the
    * operator is idempotent (spec-asserted). The compare uses
    * `round(cos, 4)` so a borderline pair cannot flip between engines.
    *
    * Pair-budget guard (the [[graft.operators.DedupOps.MaxPrefixCandidates]]
    * analog): the within-cell cost is exactly Σ c·(c−1)/2 over the cell
    * histogram — k rows, one linear aggregation, dwarfed by the join it
    * protects. A codebook too coarse for its corpus (cell occupancy
    * ~n/k makes the sum ~n²/k) fails FAST with the actionable knob:
    * train more centroids (k ∝ corpus / target-cell-size,
    * [[ivfKmeans]]) so per-cell membership stays bounded.
    */
  val MaxSemanticPairs = 100000000L

  def semanticDedup(spark: SparkSession, sfDir: String): DataFrame =
    semanticDedupCore(spark, sfDir, MaxSemanticPairs)

  private[graft] def semanticDedupCore(spark: SparkSession, sfDir: String,
      maxPairs: Long): DataFrame = {
    val e = Tables.embeddingsFanned(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    // assignment is one broadcast pass; checkpoint so the two self-join
    // sides read the materialized (vec_id, embedding, cell) frame
    // instead of re-running the codebook scoring per side
    val cells = ivfRanked(e, ivfCentroids(e)).filter(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("cid").as("cell"))
      .corpusCheckpoint()
    // c·(c−1) is even so /2 is exact; long arithmetic throughout
    val pairCount = cells.groupBy(col("cell"))
      .agg(count(lit(1)).as("c"))
      .agg(coalesce(sum(col("c") * (col("c") - 1)), lit(0L)).cast("long"))
      .head().getLong(0) / 2
    if (pairCount > maxPairs)
      throw new IllegalStateException(
        s"semantic-dedup pair budget exceeded: $pairCount within-cell " +
          s"pairs > $maxPairs. The codebook is too coarse for this corpus " +
          "— train more centroids (k ∝ corpus size / target cell size, " +
          "see ivfKmeans) so per-cell membership stays bounded.")
    val a = cells.as("a"); val b = cells.as("b")
    val dropped = a.join(b,
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .filter(round(cosine(col("a.embedding"), col("b.embedding")), 4) >= 0.4)
      .select(col("b.vec_id").as("vec_id")).distinct()
    cells.join(dropped, Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("cell"))
      .orderBy(col("vec_id"))
  }

  val semanticDedupSql: String =
    """WITH x AS (
      |  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
      |         generate_subscripts(embedding, 1) AS i
      |  FROM embeddings
      |), c AS (
      |  SELECT vec_id AS cid, v AS cv, i FROM x WHERE vec_id BETWEEN 1 AND 16
      |), scored AS (
      |  SELECT x.vec_id, c.cid,
      |    ROUND(SUM(x.v*c.cv) / (SQRT(SUM(x.v*x.v)) * SQRT(SUM(c.cv*c.cv))), 6) AS ccos
      |  FROM x JOIN c ON x.i = c.i
      |  GROUP BY 1, 2
      |), cells AS (
      |  SELECT vec_id, cid AS cell FROM (
      |    SELECT vec_id, cid,
      |      row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rn
      |    FROM scored) r WHERE rn = 1
      |), pr AS (
      |  SELECT a.vec_id AS keep_id, b.vec_id AS drop_id
      |  FROM cells a JOIN cells b ON a.cell = b.cell AND a.vec_id < b.vec_id
      |), s AS (
      |  SELECT pr.keep_id, pr.drop_id,
      |    ROUND(SUM(xa.v*xb.v) / (SQRT(SUM(xa.v*xa.v)) * SQRT(SUM(xb.v*xb.v))), 4) AS score
      |  FROM pr
      |  JOIN x xa ON xa.vec_id = pr.keep_id
      |  JOIN x xb ON xb.vec_id = pr.drop_id AND xb.i = xa.i
      |  GROUP BY pr.keep_id, pr.drop_id
      |)
      |SELECT cells.vec_id, cells.cell FROM cells
      |WHERE cells.vec_id NOT IN (SELECT DISTINCT drop_id FROM s WHERE score >= 0.4)
      |ORDER BY cells.vec_id""".stripMargin

  // -------------------------------------------------------------------
  // HNSW-style graph ANN (Malkov & Yashunin '16; Malkov et al. '14 NSW)
  // -------------------------------------------------------------------

  /** Catalog base of the persisted graph-ANN index family. */
  private[graft] val HnswIndexBuckets = 16
  /** Layer-0 out-degree: within-cell kNN edges per node. */
  private[graft] val HnswM = 8
  /** Hub → most-central cell members (the descend edges). */
  private[graft] val HnswHubFanout = 32
  /** Beam width (HNSW's ef) and hop cap for the probe. ef is the
    * recall/cost knob: this corpus is NEAR-ORTHOGONAL random vectors —
    * the adversarial case for graph ANN, where proximity to a neighbor
    * barely predicts proximity to the query — so the gated floor needs
    * a large ef (measured here: ef 32 → recall 6/10, ef 128 → 9/10 at
    * the 2000-vector scale). On production embeddings with manifold
    * structure the same machinery reaches higher recall at far smaller
    * ef; the probe's COST CONTRACT is ef-bounded either way. */
  private[graft] val HnswBeam = 128
  private[graft] val HnswMaxHops = 8
  /** Gated recall floor: |ANN∩exact| of the top 10. */
  private[graft] val HnswRecallFloor = 7

  /** Build-once half of the GRAPH vector index — the last modern ANN
    * shape after IVF/PQ: a navigable-small-world graph in the HNSW
    * mold, flattened to the two layers the hierarchy actually buys at
    * this corpus shape. The UPPER layer is a fully-meshed set of HUBS
    * (the most-centroid-central member of each IVF cell — the role
    * HNSW's sparse top layers play: long-range routing); LAYER 0 is a
    * within-cell kNN graph (out-degree [[HnswM]], the local refinement
    * edges) plus hub↔member edges so the search can descend from
    * routing into refinement and ascend back out. Per-node degree is
    * bounded BY CONSTRUCTION (members: M kNN + 1 ascend; hubs: that
    * plus (nCells−1) mesh + [[HnswHubFanout]] descend), so the
    * adjacency table is O(n·M) rows — the HNSW memory contract.
    *
    * Persisted as an epoch family with TWO sidecars: `_vecs`, the
    * (vec_id, embedding) table BUCKETED BY vec_id so the probe's
    * per-hop candidate-embedding fetches are bucket-pruned point
    * lookups, and `_entry`, the 1-row search entry point. The
    * adjacency itself is bucketed by src for the same reason. At
    * 100 TB this pair IS the serving index: build cost is one
    * co-partitioned within-cell self-join (Σ|cell|² pair work, the
    * [[hardNegatives]] bound) + two bucketed writes, amortized over
    * every query after it.
    */
  /** Cells larger than this sub-bucket their within-cell kNN candidate
    * pool by a 4-plane sign-LSH key — the adaptive gate that keeps the
    * build's pair cost bounded when cells grow with the corpus (the
    * bitmap↔prefix-filter crossover discipline: below the gate the
    * exact within-cell pool is affordable and fires at the sf test
    * scales; above it, candidates come from the (cell × LSH-bucket)
    * intersection — directionally close, the HNSW-build candidate
    * restriction — executed at natural scale by CrossoverBench's graph
    * section). */
  private[graft] val HnswSubBucketGate = 512L
  private[graft] val HnswSubPlanes = 4
  private[graft] val HnswDim = 64

  /** Construction bound on per-node out-degree: a member carries ≤ M
    * kNN + 1 ascend edges; a hub adds the (nCells−1) mesh plus the
    * descend fanout (central members + one rep per sign-LSH direction
    * bucket). Spec- and crossover-asserted. */
  private[graft] val HnswMaxDegreeBound: Long =
    HnswM + 1 + 15 + HnswHubFanout + (1 << HnswSubPlanes)

  /** The graph family's full sidecar set: `_vecs` (vec_id-bucketed
    * point lookups for the probe), `_cells` (cell-bucketed assignment
    * layout for the APPEND path's candidate reads — the same relation
    * in the other physical layout, the price of pruned access from
    * both sides), `_hubs` + `_cent` (routing metadata the append
    * re-encodes under), `_entry` (search start). */
  private[graft] val HnswSidecars =
    Seq("_vecs", "_entry", "_cent", "_cells", "_hubs")

  /** Resolves [[hnswLifecycleIndexName]] — ONE graph-index family
    * serves every hnsw key (the r14 verdict's build-sharing ask,
    * completing the trio with [[ensureIvfTrainedIndex]] /
    * [[ensureIvfPqIndex]]): the probes ride whichever epoch the
    * lifecycle last maintained, and a fresh environment one-shot
    * builds the same quarter sub-corpus here. The lifecycle's
    * stream ≡ batch recall gate licenses it; full-corpus-scale build
    * evidence lives in CrossoverBench §H (100K vectors). */
  def ensureHnswIndex(spark: SparkSession, sfDir: String): String =
    Layout.ensureEpochIndex(spark, hnswLifecycleIndexName(sfDir),
        sidecars = HnswSidecars) { name =>
      val sub = Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("embedding"))
        .filter(col("vec_id") % HnswLcMod === 0)
      buildHnswEpochFrom(spark, sub, centSource = Some(sub))(name)
    }

  /** Build one epoch of the graph index from an explicit vector frame
    * (the buildIvfPqEpochFrom shape, shared with CrossoverBench's
    * 100K-vector section). `centSource` overrides where the coarse
    * centroids come from — the lifecycle trains them on the FULL
    * corpus while building from half (the annLifecycle codebook
    * convention), so streamed appends route under the same cells. */
  private[graft] def buildHnswEpochFrom(spark: SparkSession, e0: DataFrame,
      centSource: Option[DataFrame] = None)(name: String): Unit = {
      import org.apache.spark.sql.expressions.Window
      val e = e0.select(col("vec_id"), col("embedding"))
      val cents = ivfCentroids(centSource.getOrElse(e))
      // cache the shared frame PRE-PARTITIONED BY CELL (r16, guide
      // §2.4 — two operations keyed the same way share one exchange):
      // the hub window, the cell-size window, the (cell × LSH-bucket)
      // rep window, the within-cell self-join and the ascend join all
      // cluster on `cell` (hash-partitioning on a subset of a window/
      // join's keys satisfies its distribution), so establishing the
      // partitioning once in the cache removes their per-consumer
      // exchanges of the cells frame.
      val cells = ivfRanked(e, cents).filter(col("rn") === 1)
        .select(col("vec_id"), col("embedding"), col("cid").as("cell"),
          col("ccos"))
        .repartition(col("cell"))
        .persist()
      // force the shared frame ONCE before the epoch's writes run
      // concurrently (r16, guide §2.6) — parallel first actions would
      // otherwise race its materialization
      cells.count()
      try {
        val hubW = Window.partitionBy(col("cell"))
          .orderBy(col("ccos").desc, col("vec_id"))
        val ranked = cells.withColumn("crn", row_number().over(hubW))
        // bounded (one row per cell) and read by five consumers — the
        // mesh's both sides, descend, ascend, the `_hubs` write, and
        // the entry-point head; localCheckpoint computes the window
        // once and cuts the plan under the concurrent writes
        val hubs = ranked.filter(col("crn") === 1)
          .select(col("cell"), col("vec_id").as("hub_id"),
            col("embedding").as("hub_emb"))
          .localCheckpoint()

        // layer 0: within-cell kNN (one co-partitioned self-join); the
        // candidate pool sub-buckets by sign-LSH above the adaptive gate
        val cellN = Window.partitionBy(col("cell"))
        val withSub = cells
          .withColumn("csize", count(lit(1)).over(cellN))
          .withColumn("sub", when(col("csize") > HnswSubBucketGate,
            annBucket(col("embedding"), HnswSubPlanes, HnswDim))
            .otherwise(lit("")))
        val a = withSub.select(col("cell"), col("sub"), col("vec_id").as("src"),
          col("embedding").as("semb"))
        val b = withSub.select(col("cell"), col("sub"), col("vec_id").as("dst"),
          col("embedding").as("demb"))
        val kW = Window.partitionBy(col("src"))
          .orderBy(col("sim").desc, col("dst"))
        val localK = a.join(b, Seq("cell", "sub")).filter(col("src") =!= col("dst"))
          .select(col("src"), col("dst"),
            round(cosine(col("semb"), col("demb")), 6).as("sim"))
          .withColumn("rn", row_number().over(kW)).filter(col("rn") <= HnswM)
          .select(col("src"), col("dst"), col("sim"))

        // upper layer: full hub mesh (nCells² rows — tiny by contract)
        val h1 = hubs.select(col("hub_id").as("src"), col("hub_emb").as("semb"))
        val h2 = hubs.select(col("hub_id").as("dst"), col("hub_emb").as("demb"))
        val mesh = h1.crossJoin(broadcast(h2)).filter(col("src") =!= col("dst"))
          .select(col("src"), col("dst"),
            round(cosine(col("semb"), col("demb")), 6).as("sim"))

        // descend: hub → its cell's most-central members PLUS the
        // most-central representative of every (cell × sign-LSH
        // direction bucket) — HNSW's neighbor-DIVERSITY heuristic:
        // central fanout alone never reaches a peripheral sub-cluster
        // (its members rank low on centrality and ascend edges point
        // the wrong way), so the hub needs one edge into each
        // DIRECTION class of its cell; local kNN takes over from the
        // representative. Ascend: member → hub.
        val central = ranked.filter(col("crn") <= HnswHubFanout + 1)
          .select(col("cell"), col("vec_id"), col("embedding"))
        val repW = Window.partitionBy(col("cell"), col("sub"))
          .orderBy(col("ccos").desc, col("vec_id"))
        val reps = cells
          .withColumn("sub", annBucket(col("embedding"), HnswSubPlanes, HnswDim))
          .withColumn("srn", row_number().over(repW)).filter(col("srn") === 1)
          .select(col("cell"), col("vec_id"), col("embedding"))
        val descendTargets = central.union(reps)
          .dropDuplicates("cell", "vec_id")
        val descend = hubs.join(descendTargets, Seq("cell"))
          .filter(col("hub_id") =!= col("vec_id"))
          .select(col("hub_id").as("src"), col("vec_id").as("dst"),
            round(cosine(col("hub_emb"), col("embedding")), 6).as("sim"))
        val ascend = cells.join(hubs, Seq("cell"))
          .filter(col("vec_id") =!= col("hub_id"))
          .select(col("vec_id").as("src"), col("hub_id").as("dst"),
            round(cosine(col("embedding"), col("hub_emb")), 6).as("sim"))

        val edges = localK.union(mesh).union(descend).union(ascend)
          .groupBy(col("src"), col("dst")).agg(max(col("sim")).as("sim"))
        // six independent writes of one epoch — overlapped (guide
        // §2.6): every unit reads only the forced `cells` cache, the
        // checkpointed `hubs`, or the source frame; none reads a table
        // a sibling writes. The serial form paid each write's driver-
        // side analysis + commit back to back.
        import spark.implicits._
        Layout.inParallel(
          () => Layout.writeBucketed(edges, name, "src", HnswIndexBuckets),
          () => Layout.writeBucketed(e, name + "_vecs", "vec_id", HnswIndexBuckets),
          () => Layout.writeBucketed(
            cells.select(col("vec_id"), col("embedding"), col("cell"), col("ccos")),
            name + "_cells", "cell", HnswIndexBuckets),
          () => hubs.write.format("parquet").saveAsTable(name + "_hubs"),
          () => cents.write.format("parquet").saveAsTable(name + "_cent"),
          // entry: the lowest-id hub — deterministic, and a hub by
          // construction sits one mesh hop from every other region
          () => Seq(hubs.agg(min(col("hub_id"))).head().getLong(0)).toDF("entry_id")
            .write.format("parquet").saveAsTable(name + "_entry"))
      } finally cells.unpersist()
  }

  /** Streamed-append half of the graph family — the per-micro-batch
    * maintenance step [[graft.streaming.VectorStream.appendGraphStream]]
    * drives: assign arrivals to their cells under the epoch's OWN
    * `_cent` sidecar (never a retrained one), read ONLY the touched
    * cells' existing members from the cell-bucketed `_cells` layout
    * (pruned — the append path never scans the index), kNN the
    * arrivals against existing + intra-batch candidates, and append
    * four edge classes: arrival→kNN, the REVERSE kNN edges (without
    * them an appended node is undiscoverable — edges into it must
    * exist), and the hub ascend/descend pair. Appends preserve every
    * table's bucket spec, so probes keep pruning over build + appends
    * alike. Append-phase caveat, documented: reverse and descend
    * edges GROW old nodes' out-degree (bounded per batch by M·|batch|
    * and |batch| respectively) — an append-only table cannot re-prune
    * its neighbors; compaction back to the construction bound is the
    * next epoch rotation, exactly how HNSW deployments handle it. */
  private[graft] def appendToHnswIndex(spark: SparkSession, name: String,
      batch: DataFrame): Unit = {
    import org.apache.spark.sql.expressions.Window
    val cents = spark.table(name + "_cent")
    val hubs = spark.table(name + "_hubs")
    val assigned = ivfRanked(batch.select(col("vec_id"), col("embedding")), cents)
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("cid").as("cell"), col("ccos"))
      .localCheckpoint() // batch-sized; read plan must not list appended files
    // one bounded collect serves BOTH the emptiness gate and the
    // touched-cell prune (r16, guide §2.4 — the former isEmpty was its
    // own Spark action before this same collect)
    val batchCells = assigned.select(col("cell")).distinct()
      .collect().map(_.getLong(0))
    if (batchCells.isEmpty) return
    val existing = spark.table(name + "_cells")
      .filter(col("cell").isin(batchCells.map(Long.box): _*))
      .select(col("cell"), col("vec_id"), col("embedding"))
    val cand = existing.union(
      assigned.select(col("cell"), col("vec_id"), col("embedding")))
    val kW = Window.partitionBy(col("src")).orderBy(col("sim").desc, col("dst"))
    val knn = assigned
      .select(col("cell"), col("vec_id").as("src"), col("embedding").as("semb"))
      .join(cand.select(col("cell"), col("vec_id").as("dst"),
        col("embedding").as("demb")), Seq("cell"))
      .filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst"),
        round(cosine(col("semb"), col("demb")), 6).as("sim"))
      .withColumn("rn", row_number().over(kW)).filter(col("rn") <= HnswM)
      .select(col("src"), col("dst"), col("sim"))
    // forward + reverse from ONE pass over the kNN rows (r16, guide
    // §2.4): `knn.union(knn.select(dst, src, ...))` duplicated the
    // whole candidate-join + window subtree — Spark does not share
    // union branches — so the batch paid the kNN twice. A row-local
    // explode of both directions emits the identical edge multiset
    // from a single evaluation. Same for the hub ascend/descend pair.
    def bothDirections(pairs: DataFrame, a: String, b: String): DataFrame =
      pairs.select(explode(array(
          struct(col(a).as("src"), col(b).as("dst"), col("sim")),
          struct(col(b).as("src"), col(a).as("dst"), col("sim")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"),
          col("e.sim").as("sim"))
    val hubEdges = assigned.join(hubs, Seq("cell"))
      .filter(col("vec_id") =!= col("hub_id"))
      .select(col("vec_id"), col("hub_id"),
        round(cosine(col("embedding"), col("hub_emb")), 6).as("sim"))
    val edges = bothDirections(knn, "src", "dst")
      .union(bothDirections(hubEdges, "vec_id", "hub_id"))
      .groupBy(col("src"), col("dst")).agg(max(col("sim")).as("sim"))
      .localCheckpoint() // edges read `_cells`, which a sibling write appends
    // three independent appends of materialized frames — overlapped
    // (guide §2.6); each preserves its table's bucket spec
    Layout.inParallel(
      () => edges.write.format("parquet")
        .bucketBy(HnswIndexBuckets, "src").sortBy("src")
        .mode("append").saveAsTable(name),
      () => assigned.select(col("vec_id"), col("embedding")).write.format("parquet")
        .bucketBy(HnswIndexBuckets, "vec_id").sortBy("vec_id")
        .mode("append").saveAsTable(name + "_vecs"),
      () => assigned.select(col("vec_id"), col("embedding"), col("cell"), col("ccos"))
        .write.format("parquet")
        .bucketBy(HnswIndexBuckets, "cell").sortBy("cell")
        .mode("append").saveAsTable(name + "_cells"))
  }

  /** The beam-search loop over a built graph index — shared by
    * [[hnswTopK]] and CrossoverBench's 100K section so the probe
    * semantics cannot drift between them. Returns the final beam
    * (scored, best-first) and the number of nodes visited. */
  private[graft] def hnswBeamSearch(spark: SparkSession, name: String,
      qEmb: Seq[Float], ef: Int, maxHops: Int): (Seq[(Long, Double)], Int) = {
    val qLit = typedLit(qEmb)
    val idx = spark.table(name)
    val vecs = spark.table(name + "_vecs")
    def scoreIds(ids: Seq[Long]): Seq[(Long, Double)] =
      vecs.filter(col("vec_id").isin(ids.map(Long.box): _*))
        .select(col("vec_id"), cosine(col("embedding"), qLit).as("s"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

    val entry = spark.table(name + "_entry").head().getLong(0)
    var beam: Seq[(Long, Double)] = scoreIds(Seq(entry))
    var visited = Set(entry)
    var expanded = Set.empty[Long]
    var hop = 0
    var done = false
    while (hop < maxHops && !done) {
      val frontier = beam.map(_._1).filterNot(expanded)
      if (frontier.isEmpty) done = true
      else {
        expanded ++= frontier
        val nbrs = idx.filter(col("src").isin(frontier.map(Long.box): _*))
          .select(col("dst")).distinct().collect().map(_.getLong(0))
          .filterNot(visited).toSeq
        if (nbrs.isEmpty) done = true
        else {
          visited ++= nbrs
          beam = (beam ++ scoreIds(nbrs))
            .sortBy { case (id, s) => (-s, id) }.take(ef)
        }
      }
      hop += 1
    }
    (beam.sortBy { case (id, s) => (-s, id) }, visited.size)
  }

  /** Query half: BOUNDED BEAM SEARCH over the persisted graph — the
    * HNSW probe loop with the frontier on the driver (≤ [[HnswBeam]]
    * ids, the collect-small-state codebook precedent) and every
    * per-hop data access a bucket-pruned probe of the index tables:
    * neighbor expansion reads only the frontier's src buckets of the
    * adjacency, candidate scoring reads only the new ids' vec buckets
    * of `_vecs`. Each hop therefore touches ≤ beam·maxDegree rows of
    * adjacency and ≤ that many vectors, for ≤ [[HnswMaxHops]] hops —
    * at 100 TB the probe cost is INDEPENDENT of corpus size, which is
    * the point of graph ANN serving.
    *
    * Gating (the q_approx_distinct / q_heavy_hitters discipline): the
    * hashed output is the EXACT top-10 twin — identical to
    * [[knnCosine]], oracle-replayable — plus a `recall_ok` boolean
    * asserting the beam search recovered ≥ [[HnswRecallFloor]] of the
    * true top 10. The ANN result itself is graph-construction
    * dependent and deliberately NOT hashed; the RECALL CLAIM is.
    */
  def hnswTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val name = ensureHnswIndex(spark, sfDir)
    hnswGatedOutput(spark, name,
      Tables.embeddingsFanned(spark, sfDir)
        .select(col("vec_id"), col("embedding"))
        .filter(col("vec_id") % HnswLcMod === 0))
  }

  /** The gated-output contract shared by [[hnswTopK]] and
    * [[hnswLifecycle]]: beam-search the given graph epoch, then emit
    * the exact top-10 twin (the knnCosine expression verbatim) with
    * the recall-floor boolean — one place, so the gate cannot drift
    * between the one-shot and the streamed-append form. */
  private[graft] def hnswGatedOutput(spark: SparkSession, name: String,
      e: DataFrame): DataFrame = {
    val qEmb = e.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0)
    val (beam, _) = hnswBeamSearch(spark, name, qEmb, HnswBeam, HnswMaxHops)
    val annIds = beam.filter(_._1 != 0L).take(10).map(_._1).toSet
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("q_embedding"))
    // materialize the 10-row exact twin ONCE (r16, guide §2.4 — the
    // hnswBatchTopK precedent): the recall-flag collect below and the
    // caller's consumption of the returned frame each re-evaluated the
    // corpus-wide scoring crossJoin + TakeOrdered, doubling the probe's
    // exact pass
    val exact = e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(cosine(col("embedding"), col("q_embedding")), 4).as("score"))
      .orderBy(col("score").desc, col("vec_id"))
      .limit(10)
      .localCheckpoint()
    val exactIds = exact.collect().map(_.getLong(0)).toSet
    val recallOk = annIds.intersect(exactIds).size >= HnswRecallFloor
    exact.withColumn("recall_ok", lit(recallOk))
      .orderBy(col("score").desc, col("vec_id"))
  }

  /** Catalog base of the graph family — maintained by
    * [[hnswLifecycle]]'s rotate-and-append and SERVED by the
    * [[hnswTopK]]/[[hnswBatchTopK]] probes through
    * [[ensureHnswIndex]] (one family, the r14 build-sharing ask; a
    * probe between lifecycle calls reads the published epoch, never a
    * mid-rotation one — publication is the last step of a rotate). */
  private[graft] def hnswLifecycleIndexName(sfDir: String): String =
    "graft_hnsw_lc_" + Layout.corpusTag(sfDir)

  /** The graph family's stream ≡ batch LIFECYCLE (#14) — completing
    * the discipline that EVERY persisted index family carries a
    * driver-gated streamed-append proof: build one graph epoch from
    * HALF the vectors (even vec_ids; centroids from the full corpus,
    * the annLifecycle codebook convention), stream the odd half
    * through the REAL maintenance path
    * ([[graft.streaming.VectorStream.appendGraphStream]] —
    * micro-batches cell-assigning under the epoch's own `_cent`,
    * kNN-ing against only the touched cells' members via the pruned
    * `_cells` layout, appending forward+reverse+hub edges
    * bucket-spec-preserving), then beam-search the appended epoch and
    * gate with the UNCHANGED [[hnswTopKSql]] oracle — exact twin +
    * recall floor over the FULL corpus. A graph built-then-appended
    * is structurally different from a one-shot build (kNN edges see
    * arrival order), which is exactly why the gate is the RECALL
    * CLAIM, not graph equality: the index must still FIND the true
    * neighbors after any maintenance history. Rotates a fresh epoch
    * every call (the build+append IS the operator) and prunes to two.
    */
  /** The lifecycle runs on the `vec_id % 4 = 0` QUARTER of the corpus
    * (r14, the r13 verdict's lifecycle fixed-cost item): the stream ≡
    * batch claim — a graph built then maintained through the real
    * append path still finds the true neighbors — is corpus-SIZE
    * invariant, while the rebuild-every-call cost is linear-plus in
    * corpus, so the sub-corpus sets suite cost, not proof strength.
    * The probes ([[hnswTopK]]/[[hnswBatchTopK]]) serve the SAME
    * family over the same quarter (r15 build-sharing); scale evidence
    * for the BUILD lives where it belongs: CrossoverBench §H proves
    * it at 100K vectors. */
  private[graft] val HnswLcMod = 4L

  def hnswLifecycle(spark: SparkSession, sfDir: String): DataFrame = {
    val base = hnswLifecycleIndexName(sfDir)
    val sub = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
      .filter(col("vec_id") % HnswLcMod === 0)
    val t = Layout.rotateEpoch(spark, base, sidecars = HnswSidecars) { name =>
      buildHnswEpochFrom(spark, sub.filter(col("vec_id") % (2 * HnswLcMod) === 0),
        centSource = Some(sub))(name)
    }
    val arriving = sub.filter(col("vec_id") % (2 * HnswLcMod) =!= 0)
    Layout.withStagedParquet(arriving.repartition(4), "graft-hnswlc") { arrivals =>
      val stream = graft.streaming.VectorStream.appendGraphStream(
        spark.readStream.schema(arriving.schema)
          .option("maxFilesPerTrigger", 2).parquet(arrivals), base)
      try stream.processAllAvailable() finally stream.stop()
    }
    Layout.pruneEpochs(spark, base, keep = 2, sidecars = HnswSidecars)
    hnswGatedOutput(spark, t,
      Tables.embeddingsFanned(spark, sfDir)
        .select(col("vec_id"), col("embedding"))
        .filter(col("vec_id") % HnswLcMod === 0))
  }

  /** [[hnswTopKSql]] restricted to the lifecycle's sub-corpus. */
  val hnswLifecycleSql: String =
    """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
      |pairs AS (
      |  SELECT e.vec_id,
      |    CAST(unnest(e.embedding) AS DOUBLE) AS x,
      |    CAST(unnest(q.qe) AS DOUBLE) AS y
      |  FROM embeddings e, q
      |  WHERE e.vec_id <> 0 AND e.vec_id % 4 = 0
      |), s AS (
      |  SELECT vec_id,
      |    SUM(x*y) / (SQRT(SUM(x*x)) * SQRT(SUM(y*y))) AS score
      |  FROM pairs GROUP BY vec_id
      |)
      |SELECT vec_id, ROUND(score, 4) AS score, TRUE AS recall_ok
      |FROM s
      |ORDER BY ROUND(score, 4) DESC, vec_id
      |LIMIT 10""".stripMargin

  /** Batched probe: how many planted queries ride one sweep. */
  private[graft] val HnswBatchQueries = 8

  /** BATCH-OF-QUERIES beam search — the THROUGHPUT form of the graph
    * probe (the r12 verdict's stretch): [[hnswBeamSearch]] is the
    * serving shape, one driver round-trip per hop per query with
    * bucket-pruned point reads; an offline 100 TB consumer (hard-
    * negative mining, bulk re-ranking) runs MILLIONS of queries, where
    * the right shape flips to a FRONTIER FRAME keyed by query_id and
    * one join per hop for ALL queries simultaneously: neighbor
    * expansion is `adjacency ⋈ broadcast(frontier)` (one adjacency
    * access per hop TOTAL, amortized over every query, instead of one
    * per query), scoring is `vecs ⋈ broadcast(candidates)` with the
    * query embeddings riding the tiny broadcast. Per-hop driver state
    * is only the loop counter and an emptiness probe — beams, expanded
    * sets, and candidates stay distributed frames bounded by
    * nQueries·ef (+ ·maxDegree for one hop's candidates). The
    * crossover: per-query pruned point reads win while
    * nQueries·ef < index buckets; the batched scan-join wins as soon
    * as the frontier would touch every bucket anyway — the same
    * adaptive-posture story as the CC/bitmap gates.
    *
    * Algorithmic note: candidates are anti-joined against the expanded
    * set and the CURRENT beam rather than a full visited set — a
    * previously EVICTED node can re-enter and re-score (idempotent:
    * same cosine), which costs bounded rework instead of carrying a
    * visited frame; expansion itself is exactly-once per (query, node).
    */
  private[graft] def hnswBeamSearchBatch(spark: SparkSession, name: String,
      queries: DataFrame, ef: Int, maxHops: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val adj = spark.table(name)
    val vecs = spark.table(name + "_vecs")
    val q = queries.select(col("query_id"), col("q_emb")).localCheckpoint()
    val entry = spark.table(name + "_entry").head().getLong(0)
    val beamW = Window.partitionBy(col("query_id"))
      .orderBy(col("s").desc, col("vec_id"))

    def scored(cand: DataFrame): DataFrame =
      vecs.join(broadcast(cand), Seq("vec_id"))
        .join(broadcast(q), Seq("query_id"))
        .select(col("query_id"), col("vec_id"),
          cosine(col("embedding"), col("q_emb")).as("s"))

    var beam = scored(q.select(col("query_id"), lit(entry).as("vec_id")))
      .localCheckpoint()
    var expanded = q.select(col("query_id"), lit(entry).as("vec_id")).limit(0)
    var hop = 0
    var done = false
    while (hop < maxHops && !done) {
      // ONE materialization per hop (the beam): frontier and expanded
      // stay lazy — their lineage is ≤ one anti-join / one union per
      // hop over the hop's CHECKPOINTED beam, so plans stay bounded
      // while the loop runs 1 job per hop instead of 3 (the per-hop
      // driver jobs are the whole cost of the sweep at small nQueries;
      // at fleet scale the same change just removes two barriers).
      val frontier = beam.select(col("query_id"), col("vec_id"))
        .join(expanded, Seq("query_id", "vec_id"), "left_anti")
      if (frontier.isEmpty) done = true
      else {
        // frontier ∩ expanded = ∅ by construction (frontier IS an
        // anti-join against expanded) and both are duplicate-free, so
        // the union is already distinct — the former `.distinct()`
        // shuffled the bookkeeping frame once per hop for nothing
        // (guide §2.4: a distinct on already-unique data is an
        // accidental exchange).
        expanded = expanded.union(frontier)
        // ONE anti-join against (expanded ∪ current beam) — the same
        // exclusion set the former anti-join PAIR applied, one join
        // fewer per hop; re-entry semantics of evicted-but-unexpanded
        // nodes unchanged (they are in neither side of the union).
        val seen = expanded.union(beam.select(col("query_id"), col("vec_id")))
        val cand = adj.join(broadcast(frontier.withColumnRenamed("vec_id", "src")),
            Seq("src"))
          .select(col("query_id"), col("dst").as("vec_id")).distinct()
          .join(seen, Seq("query_id", "vec_id"), "left_anti")
        beam = beam.union(scored(cand))
          .withColumn("rn", row_number().over(beamW)).filter(col("rn") <= ef)
          .select(col("query_id"), col("vec_id"), col("s"))
          .localCheckpoint()
        // re-anchor expanded on the fresh checkpoint boundary so its
        // union chain never nests more than one hop of lazy lineage
        expanded = expanded.localCheckpoint(false)
      }
      hop += 1
    }
    beam
  }

  /** q_hnsw_batch: the batched probe under the exact-twin + recall-floor
    * gate, per query — [[HnswBatchQueries]] planted queries (vec_ids
    * 0..7) swept through ONE frame-keyed beam search over the shared
    * graph epoch. Output per query: the exact top-10 twin (knnCosine's
    * expression, self-excluded, oracle-replayable) plus that query's
    * `recall_ok` boolean; the ANN result itself is construction-
    * dependent and NOT hashed — the per-query RECALL CLAIM is, so one
    * query's beam going blind turns the driver row red. */
  def hnswBatchTopK(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val name = ensureHnswIndex(spark, sfDir)
    val eAll = Tables.embeddingsFanned(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    // queries are PLANTED vectors from the full table; the indexed
    // corpus (and the exact twin) is the shared family's quarter
    val e = eAll.filter(col("vec_id") % HnswLcMod === 0)
    val queries = eAll.filter(col("vec_id") < HnswBatchQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val beams = hnswBeamSearchBatch(spark, name, queries, HnswBeam, HnswMaxHops)
    val annW = Window.partitionBy(col("query_id"))
      .orderBy(col("s").desc, col("vec_id"))
    val annIds = beams.filter(col("vec_id") =!= col("query_id"))
      .withColumn("rn", row_number().over(annW)).filter(col("rn") <= 10)
      .select(col("query_id"), col("vec_id"))
      .collect().groupBy(_.getLong(0)).map { case (k, rs) =>
        k -> rs.map(_.getLong(1)).toSet
      } // ≤ nQueries·10 rows — the gate's own constants
    val exactW = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id"))
    val exact = e.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(cosine(col("embedding"), col("q_emb")), 4).as("score"))
      .withColumn("rn", row_number().over(exactW)).filter(col("rn") <= 10)
      .select(col("query_id"), col("vec_id"), col("score"))
      .localCheckpoint() // ≤ nQueries·10 rows, read twice
    val recallOf = exact.collect().groupBy(_.getLong(0)).map { case (k, rs) =>
      k -> (rs.map(_.getLong(1)).toSet
        .intersect(annIds.getOrElse(k, Set.empty)).size >= HnswRecallFloor)
    }
    import spark.implicits._
    val flags = recallOf.toSeq.toDF("query_id", "recall_ok")
    exact.join(broadcast(flags), Seq("query_id"))
      .orderBy(col("query_id"), col("score").desc, col("vec_id"))
  }

  val hnswBatchTopKSql: String =
    s"""WITH q AS (
       |  SELECT vec_id AS query_id, embedding AS qe FROM embeddings
       |  WHERE vec_id < $HnswBatchQueries
       |), pairs AS (
       |  SELECT q.query_id, e.vec_id,
       |    CAST(unnest(e.embedding) AS DOUBLE) AS x,
       |    CAST(unnest(q.qe) AS DOUBLE) AS y
       |  FROM embeddings e, q
       |  WHERE e.vec_id <> q.query_id AND e.vec_id % 4 = 0
       |), s AS (
       |  SELECT query_id, vec_id,
       |    SUM(x*y) / (SQRT(SUM(x*x)) * SQRT(SUM(y*y))) AS score
       |  FROM pairs GROUP BY 1, 2
       |), r AS (
       |  SELECT query_id, vec_id, ROUND(score, 4) AS score,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY ROUND(score, 4) DESC, vec_id) AS rn
       |  FROM s
       |)
       |SELECT query_id, vec_id, score, TRUE AS recall_ok
       |FROM r WHERE rn <= 10
       |ORDER BY query_id, score DESC, vec_id""".stripMargin

  /** Oracle: the exact twin + the recall claim as a literal — FALSE on
    * the Spark side is a driver hash mismatch, exactly as intended. */
  val hnswTopKSql: String =
    """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
      |pairs AS (
      |  SELECT e.vec_id,
      |    CAST(unnest(e.embedding) AS DOUBLE) AS x,
      |    CAST(unnest(q.qe) AS DOUBLE) AS y
      |  FROM embeddings e, q
      |  WHERE e.vec_id <> 0 AND e.vec_id % 4 = 0
      |), s AS (
      |  SELECT vec_id,
      |    SUM(x*y) / (SQRT(SUM(x*x)) * SQRT(SUM(y*y))) AS score
      |  FROM pairs GROUP BY vec_id
      |)
      |SELECT vec_id, ROUND(score, 4) AS score, TRUE AS recall_ok
      |FROM s
      |ORDER BY ROUND(score, 4) DESC, vec_id
      |LIMIT 10""".stripMargin
}
