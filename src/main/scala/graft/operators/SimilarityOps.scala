package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

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

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-10 nearest neighbors (cosine) of vec_id=0's embedding
    * among all other vectors. Scores rounded to 4 decimals in the output
    * AND in the sort key so the cross-engine compare is immune to the
    * ~1e-13 float-accumulation-order noise.
    */
  def knnCosine(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
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
    Tables.embeddings(spark, sfDir)
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
    val e = Tables.embeddings(spark, sfDir)
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

  val annLshTopKSql: String = {
    // identical ±1 weights as literal DOUBLE lists so both engines
    // evaluate the same constants in the same fold order
    val planeRows = (0 until 8).map { p =>
      s"($p, [${planeWeights(p, 64).map(w => if (w > 0) "1.0" else "-1.0").mkString(",")}]::DOUBLE[])"
    }.mkString(",\n  ")
    s"""WITH planes(p, w) AS (VALUES
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
       |), e AS (
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
}
