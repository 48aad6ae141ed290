package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Materialize.CorpusSyntax

/** Graph analytics beyond connected components: iterative PageRank over
  * the near-dup document graph. A curation pipeline uses this as a
  * CENTRALITY signal — a document sitting in the middle of a dense
  * near-duplicate neighborhood (boilerplate hub, template spine) ranks
  * high; peripheral one-off near-dups rank at the damping floor — which
  * feeds survivor selection and down-weighting the same way the
  * canonical-docs margin does.
  *
  * Arithmetic is EXACT INTEGER throughout (the repo-wide iterative
  * discipline — classifier GD, k-means argmin, BPE argmax): ranks live
  * in micro-units (1e6 = 1.0), per-edge contribution is `rank DIV deg`,
  * and the damping update is `150000 + (85 * inflow) DIV 100` — both
  * engines truncate non-negative integer division identically, so ten
  * iterations can never drift a single unit cross-engine. (Float
  * PageRank would reassociate differently per partitioning and could
  * not be oracle-gated; the truncation loss per step is < 1 micro-unit
  * per edge, irrelevant for a ranking signal.)
  *
  * Scale shape (the Pregel-on-SQL plan): the edge list (both
  * directions, degree attached) materializes ONCE and every iteration
  * joins it against the node-sized rank frame — shuffle carries
  * (node, long) pairs only, map-side partials reduce the inflow sums,
  * and each round's rank frame is checkpointed so the 10-round lineage
  * stays linear (the connected-components precedent,
  * DedupOps.scala:1290). On a cluster the edge table is bucketed by
  * `src` so the per-round join is exchange-free on the edge side;
  * ranks re-shuffle |V| rows per round — the minimum any PageRank pays.
  */
object GraphOps {

  val Iterations = 10
  val RankUnit = 1000000L   // 1.0 in micro-units
  val DampingFloor = 150000L // (1 - 0.85) * RankUnit

  /** PageRank over the verified exact-Jaccard near-dup graph
    * (`DedupOps.jaccardPairsIndexed`, threshold 0.5 — the same edge set
    * as `q_neardup_groups`), restricted to edge endpoints: isolated
    * documents never leave the damping floor and would add |corpus|
    * constant rows. Output: (doc_id, rank_micro) after 10 exact
    * iterations.
    */
  def pagerank(spark: SparkSession, sfDir: String): DataFrame =
    pagerankOver(DedupOps.jaccardPairsIndexed(spark, sfDir, 0.5)
      .select(col("doc_a"), col("doc_b")))
      .orderBy(col("doc_id"))

  /** The iteration core over any undirected (doc_a, doc_b) pair frame —
    * factored out so the spec can assert rank properties on planted
    * graphs (hub centrality, symmetry, conservation) independent of the
    * corpus pair generator.
    *
    * **Adaptive two-strategy operator**, the [[DedupOps.connectedComponents]]
    * posture exactly: the strategy is picked from the edge count, the
    * output is IDENTICAL either way — the update rule is commutative
    * exact-integer arithmetic, so evaluation order cannot move a unit.
    *
    *  - edge list ≤ [[DedupOps.MaxDriverEdges]] (~32 MB of long pairs):
    *    collect the PAIR LIST — not the corpus — and run the 10
    *    iterations in a driver hash map in milliseconds. Ten distributed
    *    rounds on a few-hundred-node graph cost more in job scheduling
    *    than the whole answer (measured: 2.6 s distributed vs 0.6 s
    *    total at sf0.1's 477-node near-dup graph).
    *  - larger: the distributed Pregel-on-SQL rounds
    *    ([[pagerankDistributed]]), spec-proven output-identical to the
    *    driver tier on random graphs.
    */
  private[graft] def pagerankOver(pairs: DataFrame): DataFrame =
    pagerankOver(pairs, DedupOps.MaxDriverEdges)

  /** `maxDriverEdges` injectable so the spec can force the distributed
    * tier on small planted graphs; production callers use the default. */
  private[graft] def pagerankOver(pairs: DataFrame, maxDriverEdges: Long): DataFrame = {
    val p = pairs.select(col("doc_a"), col("doc_b")).corpusCheckpoint()
    if (p.count() <= maxDriverEdges) driverPagerank(p)
    else pagerankDistributed(p)
  }

  /** Driver tier: exact-integer PageRank over the collected pair list.
    * Bounded by [[DedupOps.MaxDriverEdges]] (2M pairs): the collected
    * array is ~32 MB and the undirected adjacency built from it (4M
    * neighbor longs + map/buffer overhead) a few hundred MB — executed
    * for real at 2.45M edges in the crossover's forced-driver
    * cross-check, comfortably inside the driver heap. */
  private def driverPagerank(pairs: DataFrame): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val rows = pairs.as[(Long, Long)].collect() // ≤ MaxDriverEdges rows, bound above
    val adj = scala.collection.mutable.HashMap.empty[Long, scala.collection.mutable.ArrayBuffer[Long]]
    rows.foreach { case (a, b) =>
      adj.getOrElseUpdate(a, scala.collection.mutable.ArrayBuffer.empty) += b
      adj.getOrElseUpdate(b, scala.collection.mutable.ArrayBuffer.empty) += a
    }
    var rank = adj.keysIterator.map(_ -> RankUnit).toMap
    for (_ <- 1 to Iterations) {
      val inflow = scala.collection.mutable.HashMap.empty[Long, Long]
      for ((src, nbrs) <- adj) {
        val contrib = rank(src) / nbrs.size // non-negative: / ≡ DIV ≡ //
        nbrs.foreach(d => inflow.update(d, inflow.getOrElse(d, 0L) + contrib))
      }
      rank = adj.keysIterator
        .map(n => n -> (DampingFloor + (85L * inflow.getOrElse(n, 0L)) / 100L))
        .toMap
    }
    rank.toSeq.toDF("doc_id", "rank_micro")
  }

  /** Distributed tier: the Pregel-on-SQL rounds (scale shape in the
    * object scaladoc). */
  private[graft] def pagerankDistributed(pairs: DataFrame): DataFrame = {
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .corpusCheckpoint() // edge-sized; read 1 + Iterations times below
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    // degree rides the edge row so each round is ONE join, not two
    val edgesD = edges.join(deg, "src").corpusCheckpoint()
    val nodes = edges.select(col("src").as("doc_id")).distinct()
      .corpusCheckpoint() // endpoint-sized (≤ 2|E|)
    var ranks = nodes.select(col("doc_id"), lit(RankUnit).as("rank_micro"))
    for (_ <- 1 to Iterations) {
      val inflow = edgesD
        .join(ranks.withColumnRenamed("doc_id", "src"), "src")
        .select(col("dst"), expr("rank_micro DIV deg").as("contrib"))
        .groupBy(col("dst")).agg(sum(col("contrib")).as("inflow"))
      // every endpoint has ≥1 incoming edge (the graph is undirected),
      // but keep the left join + coalesce so the operator is correct
      // for any directed edge set too
      ranks = nodes
        .join(inflow.withColumnRenamed("dst", "doc_id"), Seq("doc_id"), "left")
        .select(col("doc_id"),
          (lit(DampingFloor) +
            expr(s"(85 * coalesce(inflow, 0L)) DIV 100")).as("rank_micro"))
        .corpusCheckpoint() // node-sized; keeps the iterative lineage linear
    }
    ranks
  }

  /** Ten unrolled exact-integer iterations over the same `jpairs` CTE
    * the near-dup group oracles use (DuckDB `//` and Spark `DIV` both
    * truncate non-negative division). */
  val pagerankSql: String = {
    val iters = (1 to Iterations).map { i =>
      s"""r$i AS (
         |  SELECT n.doc_id, CAST($DampingFloor +
         |      (85 * COALESCE(SUM(r.rank_micro // d.deg), 0)) // 100
         |    AS BIGINT) AS rank_micro
         |  FROM nodes n
         |  LEFT JOIN edges e ON e.dst = n.doc_id
         |  LEFT JOIN r${i - 1} r ON r.doc_id = e.src
         |  LEFT JOIN deg d ON d.src = e.src
         |  GROUP BY n.doc_id
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH ${DedupOps.jaccardPairCtes}, edges AS MATERIALIZED (
       |  SELECT doc_a AS src, doc_b AS dst FROM jpairs
       |  UNION ALL
       |  SELECT doc_b AS src, doc_a AS dst FROM jpairs
       |), deg AS (
       |  SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY src
       |), nodes AS (
       |  SELECT DISTINCT src AS doc_id FROM edges
       |), r0 AS (
       |  SELECT doc_id, CAST($RankUnit AS BIGINT) AS rank_micro FROM nodes
       |), $iters
       |SELECT doc_id, rank_micro FROM r$Iterations
       |ORDER BY doc_id""".stripMargin
  }

  /** Triangle census of the near-dup graph — the clique-density signal
    * that separates template FAMILIES (near-dup clusters that are
    * mutual, triangle-rich) from chains of pairwise-coincidental
    * overlap: edge count, node count, wedge count (Σ deg·(deg−1)/2),
    * triangle count, and the global clustering coefficient
    * 3·triangles / wedges.
    *
    * Plan: oriented edges (a<b, the pair generator's native form) are
    * materialized once; wedges come from ONE self-join on the middle
    * vertex (every wedge a<b<c appears exactly once) and triangles
    * from a LEFT SEMI probe of the closing edge — two shuffled
    * equi-joins, never an all-pairs product. Wedge counts come from
    * the degree frame, not the wedge join (arithmetic beats
    * enumeration). The scalar panels cross 1×1 aggregates (bounded,
    * allowlisted). At 100 TB the classic refinement is degree-ordered
    * orientation (point each edge at the higher-degree endpoint) to
    * cap the join fan-out of hub vertices; the fixtures' near-dup
    * graph has no such hubs, so the simple a<b orientation is the
    * honest plan here — noted as the documented switch.
    */
  def triangleStats(spark: SparkSession, sfDir: String): DataFrame = {
    val e = DedupOps.jaccardPairsIndexed(spark, sfDir, 0.5)
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
      .corpusCheckpoint() // reread by three consumers below
    val deg = e.select(explode(array(col("a"), col("b"))).as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("deg"))
    val wedges = e.as("e1").join(e.as("e2"), col("e1.b") === col("e2.a"))
      .select(col("e1.a").as("a"), col("e2.b").as("c"))
    // closing-edge probe renamed to sidestep self-join lineage ambiguity
    val closing = e.select(col("a").as("x"), col("b").as("y"))
    val tri = wedges.join(closing,
      col("a") === col("x") && col("c") === col("y"), "left_semi")
    val edgeStats = e.agg(count(lit(1)).as("n_edges"))
    val nodeStats = deg.agg(count(lit(1)).as("n_nodes"),
      sum(expr("(deg * (deg - 1)) div 2")).as("n_wedges"))
    val triStats = tri.agg(count(lit(1)).as("n_triangles"))
    edgeStats.crossJoin(nodeStats).crossJoin(triStats) // 1×1×1
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"), col("n_triangles"),
        when(col("n_wedges") === 0L, lit(0.0))
          .otherwise(col("n_triangles") * lit(3.0) / col("n_wedges"))
          .as("clustering"))
  }

  val triangleStatsSql: String =
    s"""WITH ${DedupOps.jaccardPairCtes}, e AS MATERIALIZED (
       |  SELECT doc_a AS a, doc_b AS b FROM jpairs
       |), deg AS (
       |  SELECT v, CAST(COUNT(*) AS BIGINT) AS deg
       |  FROM (SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e)
       |  GROUP BY v
       |), tri AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
       |  FROM e e1 JOIN e e2 ON e1.b = e2.a
       |  WHERE EXISTS (SELECT 1 FROM e e3 WHERE e3.a = e1.a AND e3.b = e2.b)
       |)
       |SELECT
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_nodes,
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges,
       |  (SELECT CAST(SUM((deg * (deg - 1)) // 2) AS BIGINT) FROM deg) AS n_wedges,
       |  tri.n_triangles,
       |  CASE WHEN (SELECT SUM((deg * (deg - 1)) // 2) FROM deg) = 0 THEN 0.0
       |       ELSE tri.n_triangles * 3.0
       |            / (SELECT SUM((deg * (deg - 1)) // 2) FROM deg) END AS clustering
       |FROM tri""".stripMargin

  /** k-core peel depth and round cap for [[kcore]]. k = 2 extracts the
    * cyclic cores of the near-dup graph (pendant coincidental-overlap
    * edges peel away; mutual template families survive). The cap is a
    * fail-fast guard, not a semantic bound: [[kcoreOver]] REQUIRES the
    * peel to reach its fixpoint within the cap — the oracle unrolls
    * exactly [[KCoreRounds]] levels, and post-fixpoint levels are
    * identities, so a converged peel matches the oracle no matter how
    * early it stopped, while an unconverged one fails loudly instead
    * of hash-mismatching. Peel rounds needed = the longest pendant
    * chain hanging off a core — spec plants a length-9 chain; a
    * near-dup graph's chains are short because edges require J ≥ 0.5
    * mutual overlap.
    */
  val KCoreK = 2
  val KCoreRounds = 12

  /** K-CORE decomposition of the near-dup graph (Seidman '83, the
    * degeneracy peel): iteratively delete nodes with fewer than k
    * alive neighbors until the fixpoint; what remains is the maximal
    * subgraph of minimum degree k — the dense mutual-duplication
    * CORES a boilerplate/template miner keeps after discarding
    * pairwise-coincidental pendants (the degree-ordered complement to
    * [[triangleStats]]' closure signal). Output: surviving doc_ids
    * with their core-subgraph degree.
    *
    * Plan: each round is one degree aggregate over the alive edge
    * frame + two LEFT SEMI filters against the keep-set — edge-sized
    * work shrinking monotonically, checkpointed per round so the
    * iterative lineage stays linear (the PageRank round discipline).
    * Rounds are data-bounded (longest pendant chain), not corpus-
    * bounded; the loop exits at the fixpoint and [[KCoreRounds]] is
    * only the fail-fast cap.
    */
  def kcore(spark: SparkSession, sfDir: String): DataFrame =
    kcoreOver(DedupOps.jaccardPairsIndexed(spark, sfDir, 0.5)
      .select(col("doc_a"), col("doc_b")))
      .orderBy(col("doc_id"))

  private[graft] def kcoreOver(pairs: DataFrame): DataFrame = {
    def undirected(e: DataFrame) =
      e.select(col("doc_a").as("doc_id"))
        .unionAll(e.select(col("doc_b").as("doc_id")))
    var edges = pairs.select(col("doc_a"), col("doc_b")).corpusCheckpoint()
    var prev = -1L
    var n = edges.count()
    var rounds = 0
    while (n != prev) {
      require(rounds < KCoreRounds,
        s"k-core peel did not converge within $KCoreRounds rounds — the " +
          "oracle unrolls exactly that many levels; raise KCoreRounds " +
          "in BOTH places")
      val keep = undirected(edges)
        .groupBy(col("doc_id")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= KCoreK)
        .select(col("doc_id"))
      edges = edges
        .join(keep.withColumnRenamed("doc_id", "doc_a"), Seq("doc_a"), "left_semi")
        .join(keep.withColumnRenamed("doc_id", "doc_b"), Seq("doc_b"), "left_semi")
        .corpusCheckpoint()
      prev = n; n = edges.count(); rounds += 1
    }
    undirected(edges).groupBy(col("doc_id")).agg(count(lit(1)).as("core_deg"))
  }

  /** [[KCoreRounds]] unrolled peel levels over the same `jpairs` CTE —
    * each level recomputes alive degrees and re-filters both edge
    * endpoints; identities once the fixpoint is reached. */
  val kcoreSql: String = {
    // every level MATERIALIZED: each references its predecessor three
    // times (degree union ×2, edge filter), and un-materialized CTE
    // inlining would re-expand the chain 3^rounds-fold
    val levels = (1 to KCoreRounds).map { i =>
      s"""k$i AS MATERIALIZED (
         |  SELECT v AS doc_id
         |  FROM (SELECT doc_a AS v FROM e${i - 1}
         |        UNION ALL SELECT doc_b AS v FROM e${i - 1})
         |  GROUP BY v HAVING COUNT(*) >= $KCoreK
         |), e$i AS MATERIALIZED (
         |  SELECT e.doc_a, e.doc_b FROM e${i - 1} e
         |  JOIN k$i x ON x.doc_id = e.doc_a
         |  JOIN k$i y ON y.doc_id = e.doc_b
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH ${DedupOps.jaccardPairCtes}, e0 AS MATERIALIZED (
       |  SELECT doc_a, doc_b FROM jpairs
       |), $levels
       |SELECT v AS doc_id, CAST(COUNT(*) AS BIGINT) AS core_deg
       |FROM (SELECT doc_a AS v FROM e$KCoreRounds
       |      UNION ALL SELECT doc_b AS v FROM e$KCoreRounds)
       |GROUP BY v
       |ORDER BY doc_id""".stripMargin
  }
}
