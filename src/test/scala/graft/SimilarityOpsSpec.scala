package graft

import org.apache.spark.sql.functions._
import graft.operators.SimilarityOps

class SimilarityOpsSpec extends SparkSpec {

  test("dot / norm / cosine on known vectors") {
    val s = spark; import s.implicits._
    val df = Seq(
      (Seq(1f, 0f), Seq(0f, 1f), 0.0),   // orthogonal
      (Seq(1f, 0f), Seq(1f, 0f), 1.0),   // identical
      (Seq(1f, 1f), Seq(1f, 1f), 1.0),
      (Seq(3f, 4f), Seq(3f, 4f), 1.0),
    ).toDF("a", "b", "expect")
    val bad = df.filter(
      abs(SimilarityOps.cosine(col("a"), col("b")) - col("expect")) > 1e-12).count()
    assert(bad === 0)
    val Seq(n) = df.limit(1).select(SimilarityOps.norm(typedLit(Seq(3f, 4f))))
      .collect().map(_.getDouble(0)).toSeq
    assert(math.abs(n - 5.0) < 1e-12)
  }

  test("knnCosine returns 10 rows, scores descending, excludes the query") {
    val k = SimilarityOps.knnCosine(spark, sf).collect()
    assert(k.length === 10)
    val scores = k.map(_.getDouble(1)).toSeq
    assert(scores === scores.sorted.reverse)
    assert(!k.map(_.getLong(0)).contains(0L))
  }

  test("annLshTopK results are a subset of exact brute-force ranking") {
    val ann = SimilarityOps.annLshTopK(spark, sf).collect().map(_.getLong(0)).toSet
    // every ANN hit must be a real vector (exactness of scoring is
    // oracle-checked; here we check the candidate plumbing)
    val all = Tables.embeddings(spark, sf).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(ann.subsetOf(all - 0L))
  }

  test("native CosineSimilarity is bitwise-equal to the HOF composition") {
    val e = Tables.embeddings(spark, sf).limit(200)
    val pairs = e.select(col("vec_id"), col("embedding"))
      .crossJoin(e.select(col("embedding").as("e2")).limit(5))
    val diff = pairs.filter(
      SimilarityOps.cosine(col("embedding"), col("e2")) =!=
        SimilarityOps.cosineHof(col("embedding"), col("e2"))).count()
    assert(diff === 0)
  }

  test("embeddingNearDup: pairs ordered, scores >= threshold") {
    val nd = SimilarityOps.embeddingNearDup(spark, sf).collect()
    assert(nd.nonEmpty)
    assert(nd.forall(r => r.getLong(0) < r.getLong(1)))
    assert(nd.forall(r => r.getDouble(2) >= 0.4))
  }

  test("ivfTopK returns 10 candidates from probed cells only") {
    val k = SimilarityOps.ivfTopK(spark, sf).collect()
    assert(k.length === 10)
    assert(!k.map(_.getLong(0)).contains(0L))
    val scores = k.map(_.getDouble(1)).toSeq
    assert(scores === scores.sorted.reverse)
  }

  test("ivfPersistedTopK: equals ivfTopK; probe is exchange-free and bucket-pruned") {
    try {
      val key = (r: org.apache.spark.sql.Row) => (r.getLong(0), r.getDouble(1))
      val expect = SimilarityOps.ivfTopK(spark, sf).collect().map(key).toSeq
      val probe = SimilarityOps.ivfPersistedTopK(spark, sf)
      assert(probe.collect().map(key).toSeq === expect)
      val plan = probe.queryExecution.executedPlan.toString
      // build-once/query-many contract: the probe itself never shuffles —
      // scan (bucket-pruned to the 2 probed cells) → filter →
      // broadcast-score → TakeOrderedAndProject
      assert(!plan.contains("Exchange hashpartitioning") &&
        !plan.contains("Exchange rangepartitioning") &&
        !plan.contains("Exchange SinglePartition"),
        s"persisted-IVF probe must be exchange-free:\n$plan")
      assert(plan.contains(
        s"SelectedBucketsCount: 2 out of ${SimilarityOps.IvfIndexBuckets}"),
        s"probe scan must bucket-prune to the nprobe cells:\n$plan")
    } finally {
      graft.operators.Layout.dropEpochFamily(spark, SimilarityOps.ivfIndexName(sf))
    }
  }

  test("ivfTrainedTopK: bucket-pruned probe of the k-means-trained index") {
    try {
      val k = SimilarityOps.ivfTrainedTopK(spark, sf).collect()
      assert(k.length === 10)
      assert(!k.map(_.getLong(0)).contains(0L))
      val scores = k.map(_.getDouble(1)).toSeq
      assert(scores === scores.sorted.reverse)
      val plan = SimilarityOps.ivfTrainedTopK(spark, sf)
        .queryExecution.executedPlan.toString
      assert(plan.contains(
        s"SelectedBucketsCount: 2 out of ${SimilarityOps.IvfTrainedBuckets}"),
        s"trained probe must bucket-prune to the nprobe cells:\n$plan")
    } finally {
      graft.operators.Layout.dropEpochFamily(spark,
        SimilarityOps.annLifecycleIndexName(sf), sidecars = Seq("_codebook"))
    }
  }

  test("ivfPqTopK: composed index — recall floor vs exact L2, bucket-pruned, exchange-free") {
    try {
      val got = SimilarityOps.ivfPqTopK(spark, sf).collect()
      assert(got.length === 10)
      assert(!got.map(_.getLong(0)).contains(0L))
      val dists = got.map(_.getLong(1)).toSeq
      assert(dists === dists.sorted) // ascending ADC distance
      // recall floor vs the EXACT integer-micro L2 top-10. Measured 4/10
      // here (and 3/10 at sf0.01) with nprobe=2 of 16 cells: the synthetic
      // near-uniform embeddings spread the true neighbors across cells
      // (candidate recall alone is 4/10; ADC loses at most one more), and
      // recall scales with nprobe as expected (4→6/10, 6→8/10 measured).
      // The floor guards against the index going blind, not against the
      // corpus being hostile to cell pruning.
      val micro = (x: Float) => math.floor(x.toDouble * 1e6 + 0.5).toLong
      val vecs = Tables.embeddings(spark, sf)
        .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).map(micro).toArray).toMap
      val q0 = vecs(0L)
      val exact = (vecs - 0L).toSeq.map { case (id, v) =>
        (v.indices.map { i => val d = v(i) - q0(i); d * d }.sum, id)
      }.sorted.take(10).map(_._2).toSet
      val overlap = got.map(_.getLong(0)).count(exact)
      assert(overlap >= 2, s"ivfpq recall $overlap/10 vs exact L2")
      // probe plan: bucket-pruned codes scan, zero exchanges — the scan
      // reads nprobe of IvfPqCells buckets of 12 B codes, never raw vectors
      val probe = SimilarityOps.ivfPqTopK(spark, sf)
      probe.collect()
      val plan = probe.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning") &&
        !plan.contains("Exchange rangepartitioning") &&
        !plan.contains("Exchange SinglePartition"),
        s"ivfpq probe must be exchange-free:\n$plan")
      assert(plan.contains(
        s"SelectedBucketsCount: ${SimilarityOps.IvfPqNProbe} out of ${SimilarityOps.IvfPqCells}"),
        s"ivfpq probe must bucket-prune to the nprobe cells:\n$plan")
    } finally {
      graft.operators.Layout.dropEpochFamily(spark,
        SimilarityOps.ivfPqLifecycleIndexName(sf), sidecars = Seq("_coarse", "_books"))
    }
  }

  test("embeddingStats covers every vector exactly once") {
    val st = SimilarityOps.embeddingStats(spark, sf)
    val total = st.agg(sum("n_vecs")).head().getLong(0)
    assert(total === Tables.embeddings(spark, sf).count())
  }

  test("LSH-bucketed near-dup pairs are a subset of brute-force pairs") {
    val key = (r: org.apache.spark.sql.Row) => (r.getLong(0), r.getLong(1))
    val brute = SimilarityOps.embeddingNearDup(spark, sf).collect().map(key).toSet
    val lsh = SimilarityOps.embeddingNearDupLsh(spark, sf).collect().map(key).toSet
    assert(lsh.subsetOf(brute)) // bucketing prunes, never invents pairs
    assert(lsh.nonEmpty)        // near-identical planted dups collide buckets
  }

  test("semanticDedup: drops within-cell near-dups, keeps lowest id, idempotent") {
    val e = Tables.embeddings(spark, sf)
    val total = e.count()
    val survivors = SimilarityOps.semanticDedup(spark, sf)
    val ids = survivors.collect().map(_.getLong(0)).toSeq
    assert(ids.length < total)          // the planted near-dups collapse
    assert(ids === ids.sorted)
    // every dropped vector has a surviving-or-dropped lower-id partner in
    // its cell at >= 0.4; cheapest sound check: survivors contain no
    // qualifying pair, which also proves idempotence of the drop rule
    val s = survivors.join(e, "vec_id")
      .select(col("vec_id"), col("cell"), col("embedding"))
    val a = s.as("a"); val b = s.as("b")
    val residual = a.join(b,
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .filter(round(SimilarityOps.cosine(
        col("a.embedding"), col("b.embedding")), 4) >= 0.4)
      .count()
    assert(residual === 0)
  }

  test("semanticDedup: pair budget fails fast with the retrain hint") {
    val ex = intercept[IllegalStateException] {
      SimilarityOps.semanticDedupCore(spark, sf, maxPairs = 10L)
    }
    assert(ex.getMessage.contains("pair budget exceeded"))
    assert(ex.getMessage.contains("train more centroids"))
  }

  test("pqTopK: exact-integer ADC distances; recall vs exact L2 at 21x compression") {
    val rows = SimilarityOps.pqTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length === 10)
    assert(rows.map(_._2).toSeq === rows.map(_._2).toSeq.sorted)
    assert(!rows.map(_._1).contains(0L))
    // driver-exact reference over the SAME integer-micro quantization
    // (floor(x*1e6 + 0.5) mirrors both engines' tie-free quantizer)
    val e = Tables.embeddings(spark, sf).select("vec_id", "embedding")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(f =>
        math.floor(f.toDouble * 1e6 + 0.5).toLong).toArray)
      .toMap
    val q = e(0L)
    def l2(v: Array[Long]): Long =
      v.zip(q).map { case (a, b) => val d = a - b; d * d }.sum
    val exact20 = e.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => (l2(v), id) }.sorted.take(20).map(_._2).toSet
    val hits = rows.map(_._1).count(exact20)
    // measured 6/10 on this corpus (near-uniform vectors — PQ's worst
    // case); the floor guards the encode/ADC mechanics, not the data
    assert(hits >= 5, s"ADC recalled only $hits of the exact top-20")
  }

  test("pqTrainedTopK: Lloyd's training cuts quantization error; probe stays valid") {
    import org.apache.spark.sql.functions.{transform => htransform}
    val (m, sub, k) = (SimilarityOps.PqSubspaces, SimilarityOps.PqSubDim,
      SimilarityOps.PqCentroids)
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        htransform(col("embedding"),
          x => floor(x.cast("double") * 1000000d + 0.5d).cast("long")).as("q"))
      .localCheckpoint()
    val comps = e
      .select(col("vec_id"), posexplode(col("q")).as(Seq("i0", "v")))
      .select(col("vec_id"), (col("i0") / sub).cast("int").as("j"),
        col("i0"), col("v"))
    val vecs = e.collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    val seeds: Array[Array[Long]] = (1 to k).map(c => vecs(c.toLong)).toArray
    def quantError(books: Array[Array[Long]]): Long =
      vecs.filter(_._1 != 0L).values.map { v =>
        (0 until m).map { j =>
          (0 until k).map { c =>
            (0 until sub).map { i =>
              val d = v(j * sub + i) - books(c)(j * sub + i); d * d
            }.sum
          }.min
        }.sum
      }.sum
    val trained = SimilarityOps.pqTrainBooks(spark, comps)
    val before = quantError(seeds)
    val after = quantError(trained)
    // measured ~24% reduction on this corpus; 15% is the guard floor
    assert(after < before * 0.85,
      s"training reduced quantization error only ${before - after} of $before")
    // the probe under trained books is well-formed and deterministic
    val rows = SimilarityOps.pqTrainedTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length === 10)
    assert(rows.map(_._2).toSeq === rows.map(_._2).toSeq.sorted)
    assert(!rows.map(_._1).contains(0L))
  }

  test("exact training recurrences are partitioning-invariant (classifier + PQ)") {
    // the exactness story of both trainers rests on order-independent
    // integer/decimal aggregation — so re-running under a different
    // shuffle width and parallelism must be BIT-identical, not close
    def underPartitions[T](n: String)(body: => T): T = {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      try { spark.conf.set("spark.sql.shuffle.partitions", n); body }
      finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    val ct1 = underPartitions("2")(
      graft.operators.TextOps.classifierTrain(spark, sf).collect()
        .map(r => (r.getString(0), r.getDouble(1))).toSeq)
    val ct2 = underPartitions("13")(
      graft.operators.TextOps.classifierTrain(spark, sf).collect()
        .map(r => (r.getString(0), r.getDouble(1))).toSeq)
    assert(ct1 === ct2, "classifier training depends on partitioning")
    val pq1 = underPartitions("2")(
      SimilarityOps.pqTrainedTopK(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq)
    val pq2 = underPartitions("13")(
      SimilarityOps.pqTrainedTopK(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq)
    assert(pq1 === pq2, "PQ training depends on partitioning")
  }

  test("ivfKmeans: k codebook rows, full dim, members pull centroids off seeds") {
    val c = SimilarityOps.ivfKmeans(spark, sf)
    assert(c.select("cid").distinct().count() === 8)
    assert(c.groupBy("cid").count().agg(min("count")).head().getLong(0) === 64)
    // training moved at least one centroid away from its seed vector
    val seeds = Tables.embeddings(spark, sf)
      .filter(col("vec_id").between(1, 8))
      .select(col("vec_id").as("cid"), posexplode(col("embedding")))
      .select(col("cid"), (col("pos") + 1).as("i"), col("col").cast("double").as("sv"))
    val moved = c.join(seeds, Seq("cid", "i"))
      .filter(abs(col("comp") - col("sv")) > 1e-9).count()
    assert(moved > 0)
  }

  test("annLifecycle: half-build + streamed-append epoch probes like the one-pass trained index") {
    // the one-pass twin is built into its OWN family here — the probe
    // keys now SERVE from the lifecycle family (the r14 verdict's
    // build-sharing ask), so an independent build is what keeps this
    // stream ≡ batch assertion non-circular
    val onePassName = "graft_ivft_onepass_spec"
    try {
      val e = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
      val viaLifecycle = SimilarityOps.annLifecycle(spark, sf).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(viaLifecycle.nonEmpty)
      SimilarityOps.buildVectorEpoch(spark, sf, e)(onePassName)
      val onePass = SimilarityOps.probeIndexWithCodebook(spark, onePassName, e)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(viaLifecycle === onePass)
      // a second call must rotate a fresh epoch and still agree
      assert(SimilarityOps.annLifecycle(spark, sf).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq === onePass)
      // and the shared-family probe key serves the lifecycle's epoch
      assert(SimilarityOps.ivfTrainedTopK(spark, sf).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq === onePass)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $onePassName")
      spark.sql(s"DROP TABLE IF EXISTS ${onePassName}_codebook")
      graft.operators.Layout.dropEpochFamily(spark,
        SimilarityOps.annLifecycleIndexName(sf), sidecars = Seq("_codebook"))
    }
  }

  test("ivfPqLifecycle: half-build + streamed-append composed index probes like the one-pass build") {
    val onePassName = "graft_ivfpq_onepass_spec"
    try {
      val e = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
      val viaLifecycle = SimilarityOps.ivfPqLifecycle(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(viaLifecycle.nonEmpty)
      // independent one-pass build (see the annLifecycle twin note)
      SimilarityOps.buildIvfPqEpoch(spark, sf, e)(onePassName)
      val q0 = e.filter(col("vec_id") === 0)
        .select(transform(col("embedding"),
          x => floor(x.cast("double") * 1000000d + 0.5d).cast("long")))
        .head().getSeq[Long](0).toArray
      val onePass = SimilarityOps.probeIvfPqIndex(spark, onePassName, q0)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(viaLifecycle === onePass)
      // and the shared-family probe key serves the lifecycle's epoch
      assert(SimilarityOps.ivfPqTopK(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq === onePass)
    } finally {
      Seq("", "_coarse", "_books").foreach(s =>
        spark.sql(s"DROP TABLE IF EXISTS $onePassName$s"))
      graft.operators.Layout.dropEpochFamily(spark,
        SimilarityOps.ivfPqLifecycleIndexName(sf), sidecars = Seq("_coarse", "_books"))
    }
  }

  test("hardNegatives: band respected, ranks dense, co-located self-join of the index") {
    try {
      val neg = SimilarityOps.hardNegatives(spark, sf)
      val rows = neg.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      // hard band: no near-dups (false negatives), no easy negatives
      assert(rows.forall { case (_, _, _, s) => s >= 0.1 && s < 0.9 })
      // never itself; ranks are 1..n per anchor with descending scores
      assert(rows.forall { case (a, _, n, _) => a != n })
      for ((a, g) <- rows.groupBy(_._1)) {
        val sorted = g.sortBy(_._2)
        assert(sorted.map(_._2).toSeq === (1L to g.length).toSeq, s"anchor $a ranks")
        val sc = sorted.map(_._4).toSeq
        assert(sc === sc.sorted.reverse, s"anchor $a order")
        assert(g.length <= 3)
      }
      // the pair stage joins two reads of the SAME cell-bucketed index
      // co-located: no exchange may sit below the join (only the ranking
      // window's hash exchange and the output sort are allowed)
      val plan = neg.queryExecution.executedPlan.toString
      val joinIdx = plan.indexOf("SortMergeJoin")
      if (joinIdx >= 0)
        assert(!plan.substring(joinIdx).contains("Exchange hashpartitioning"),
          s"index self-join must be co-located:\n$plan")
    } finally {
      graft.operators.Layout.dropEpochFamily(spark, SimilarityOps.ivfIndexName(sf))
    }
  }

  test("hnswTopK: gated output is the exact twin and the recall floor holds") {
    import org.apache.spark.sql.functions._
    try {
      val got = SimilarityOps.hnswTopK(spark, sf).collect()
      assert(got.length === 10)
      assert(got.forall(_.getBoolean(2)),
        "beam search fell below the gated recall floor")
      // the hashed rows ARE the exact twin over the shared family's
      // quarter corpus — recomputed independently here by brute force
      val e = Tables.embeddings(spark, sf)
        .filter(col("vec_id") % SimilarityOps.HnswLcMod === 0)
      val q = e.filter(col("vec_id") === 0)
        .select(col("embedding").as("qe"))
      val exact = e.filter(col("vec_id") =!= 0).crossJoin(broadcast(q))
        .select(col("vec_id"),
          round(SimilarityOps.cosine(col("embedding"), col("qe")), 4).as("s"))
        .orderBy(col("s").desc, col("vec_id")).limit(10).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got.map(r => (r.getLong(0), r.getDouble(1))).toSeq === exact)
      assert(!got.map(_.getLong(0)).contains(0L))
    } finally {
      graft.operators.Layout.dropEpochFamily(spark,
        SimilarityOps.hnswLifecycleIndexName(sf), sidecars = SimilarityOps.HnswSidecars)
    }
  }

  test("hnswLifecycle: streamed-append graph passes the same gate as the one-shot build") {
    import org.apache.spark.sql.functions._
    val base = SimilarityOps.hnswLifecycleIndexName(sf)
    try {
      val got = SimilarityOps.hnswLifecycle(spark, sf).collect()
      assert(got.length === 10)
      assert(got.forall(_.getBoolean(2)),
        "beam search over the appended graph fell below the recall floor")
      // hashed rows are STILL the sub-corpus exact twin (brute force)
      val m = SimilarityOps.HnswLcMod
      val sub = Tables.embeddings(spark, sf)
        .filter(col("vec_id") % m === 0)
      val q = sub.filter(col("vec_id") === 0)
        .select(col("embedding").as("q_embedding"))
      val exact = sub.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .select(col("vec_id"),
          round(SimilarityOps.cosine(col("embedding"), col("q_embedding")), 4)
            .as("score"))
        .orderBy(col("score").desc, col("vec_id")).limit(10).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got.map(r => (r.getLong(0), r.getDouble(1))).toSeq === exact)
      // every arriving vector really went through the append path: the
      // appended epoch's vector table carries the FULL sub-corpus
      val t = graft.operators.Layout.currentEpochTable(spark, base).get
      assert(spark.table(t + "_vecs").count() === sub.count())
      val appended = spark.table(t + "_cells")
        .filter(col("vec_id") % (2 * m) =!= 0).count()
      assert(appended > 0)
      // appended nodes are DISCOVERABLE: edges INTO them exist
      assert(spark.table(t).filter(col("dst") % (2 * m) =!= 0).count() > 0)
    } finally {
      graft.operators.Layout.dropEpochFamily(spark, base,
        sidecars = SimilarityOps.HnswSidecars)
    }
  }

  test("hnsw index: bounded degree, full coverage, hub mesh, pruned probes") {
    import org.apache.spark.sql.functions._
    try {
      val name = SimilarityOps.ensureHnswIndex(spark, sf)
      val edges = spark.table(name)
      // the shared family indexes the quarter sub-corpus (r15 sharing)
      val nVecs = Tables.embeddings(spark, sf)
        .filter(col("vec_id") % SimilarityOps.HnswLcMod === 0).count()
      // every vector has out-edges (no unreachable islands at the src level)
      assert(edges.select(col("src")).distinct().count() === nVecs)
      // degree bounded BY CONSTRUCTION: members ≤ M+1, hubs add the
      // mesh (nCells−1) and the descend fanout
      val maxDeg = edges.groupBy(col("src")).count()
        .agg(max(col("count"))).head().getLong(0)
      val bound = SimilarityOps.HnswMaxDegreeBound
      assert(maxDeg <= bound, s"out-degree $maxDeg exceeds construction bound $bound")
      // the entry point is a hub: it must reach every other hub in one
      // hop (the upper-layer mesh), i.e. have ≥ nCells−1 distinct
      // hub-reaching edges — verified via mutual-mesh symmetry
      val entry = spark.table(name + "_entry").head().getLong(0)
      val entryOut = edges.filter(col("src") === entry)
        .select(col("dst")).collect().map(_.getLong(0)).toSet
      val entryIn = edges.filter(col("dst") === entry)
        .select(col("src")).collect().map(_.getLong(0)).toSet
      val mutual = entryOut.intersect(entryIn)
      assert(mutual.size >= 15, s"entry hub sees only ${mutual.size} mutual peers")
      // per-hop probes are bucket-pruned on BOTH index tables
      val adjProbe = edges.filter(col("src").isin(Long.box(entry)))
      val adjPlan = adjProbe.queryExecution.executedPlan.toString
      assert(adjPlan.contains(
        s"SelectedBucketsCount: 1 out of ${SimilarityOps.HnswIndexBuckets}"),
        s"adjacency probe must bucket-prune:\n$adjPlan")
      val vecProbe = spark.table(name + "_vecs")
        .filter(col("vec_id").isin(Long.box(entry), Long.box(entry + 1)))
      val vecPlan = vecProbe.queryExecution.executedPlan.toString
      assert(vecPlan.contains("SelectedBucketsCount:") &&
        !vecPlan.contains(
          s"SelectedBucketsCount: ${SimilarityOps.HnswIndexBuckets} out of"),
        s"vector fetch must bucket-prune:\n$vecPlan")
    } finally {
      graft.operators.Layout.dropEpochFamily(spark,
        SimilarityOps.hnswLifecycleIndexName(sf), sidecars = SimilarityOps.HnswSidecars)
    }
  }

  test("powerIteration: integer iterate aligns with a double-precision " +
      "reference (cos ≥ 0.999) and the Rayleigh quotient is monotone") {
    val got = SimilarityOps.powerIteration(spark, sf).collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1))).sortBy(_._1).map(_._2)
    assert(got.length === 64)
    assert(got.map(math.abs).max === 1000000L,
      "rescale must pin the largest component to ±1e6")
    // double-precision reference over the same micro-quantized Gramian
    val vecs = Tables.embeddings(spark, sf).select("embedding").collect()
      .map(_.getSeq[Float](0).map(x => math.floor(x.toDouble * 1e6 + 0.5)).toArray)
    val d = 64
    val g = Array.ofDim[Double](d, d)
    for (v <- vecs; i <- 0 until d; j <- 0 until d) g(i)(j) += v(i) * v(j)
    def matVec(x: Array[Double]) =
      Array.tabulate(d)(i => (0 until d).map(j => g(i)(j) * x(j)).sum)
    def rayleigh(x: Array[Double]) = {
      val gx = matVec(x)
      (0 until d).map(i => x(i) * gx(i)).sum / (0 until d).map(i => x(i) * x(i)).sum
    }
    var ref = Array.fill(d)(1.0)
    var lastR = Double.NegativeInfinity
    for (_ <- 1 to SimilarityOps.PowerIters) {
      val r = rayleigh(ref)
      assert(r >= lastR - 1e-6, "Rayleigh quotient must be non-decreasing")
      lastR = r
      val w = matVec(ref)
      val m = w.map(math.abs).max
      ref = w.map(_ / m)
    }
    val dot = (0 until d).map(i => got(i).toDouble * ref(i)).sum
    val cos = dot / (math.sqrt(got.map(x => x.toDouble * x).sum) *
      math.sqrt(ref.map(x => x * x).sum))
    assert(cos >= 0.999, s"integer iterate diverged from the double reference: $cos")
  }

  test("powerLifecycle: bulk half + streamed Gramian deltas ≡ the one-shot " +
      "iteration, and the streamed partials are load-bearing") {
    import graft.operators.Layout
    val base = SimilarityOps.gramLifecycleBase(sf)
    try {
      val got = SimilarityOps.powerLifecycle(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val want = SimilarityOps.powerIteration(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(got.nonEmpty)
      assert(got.toSeq === want.toSeq,
        "maintained-Gramian iterate must equal the one-pass reduction")
      // the epoch holds MORE partial rows than the bulk half alone —
      // the streamed deltas actually landed
      val t = Layout.currentEpochTable(spark, base).get
      val bulkRows = SimilarityOps.gramPartialsOf(
        Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
          .filter(col("vec_id") % 2 === 0)).count()
      assert(spark.table(t).count() > bulkRows,
        "no streamed Gramian partials landed")
    } finally Layout.dropEpochFamily(spark, base)
  }

  test("hnswBatchTopK: per-query beams bounded by ef, every query clears the " +
      "recall floor, twin rows are 10 per query") {
    try {
      val out = SimilarityOps.hnswBatchTopK(spark, sf).collect()
      val perQ = out.groupBy(_.getLong(0))
      assert(perQ.keySet === (0L until SimilarityOps.HnswBatchQueries).toSet)
      assert(perQ.values.forall(_.length === 10))
      assert(out.forall(_.getBoolean(3)),
        "a query's batched beam went blind (recall_ok=false)")
      // no query returns itself in its own twin
      assert(out.forall(r => r.getLong(1) != r.getLong(0)))
      // beams stay ef-bounded per query — the frame-keyed loop's memory contract
      val name = SimilarityOps.ensureHnswIndex(spark, sf)
      val e = Tables.embeddings(spark, sf)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
        .filter(col("query_id") < SimilarityOps.HnswBatchQueries)
      val beams = SimilarityOps.hnswBeamSearchBatch(spark, name, e,
        SimilarityOps.HnswBeam, SimilarityOps.HnswMaxHops)
      val sizes = beams.groupBy("query_id").count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(sizes.values.forall(_ <= SimilarityOps.HnswBeam))
      assert(sizes.keySet === (0L until SimilarityOps.HnswBatchQueries).toSet)
    } finally {
      graft.operators.Layout.dropEpochFamily(spark,
        SimilarityOps.hnswLifecycleIndexName(sf), sidecars = SimilarityOps.HnswSidecars)
    }
  }

  test("embeddingCovariance: matches a BigInt driver recompute; diagonal " +
      "cov numerators non-negative (Cauchy–Schwarz)") {
    val rows = SimilarityOps.embeddingCovariance(spark, sf).collect()
    val got = rows
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (BigInt(r.getLong(2)), BigInt(r.getString(3))))
      .toMap
    assert(got.size === 64 * 65 / 2) // upper triangle incl. diagonal only
    // independent BigInt recompute from the raw vectors
    val vecs = Tables.embeddings(spark, sf)
      .select(org.apache.spark.sql.functions.col("embedding")).collect()
      .map(_.getSeq[Float](0)
        .map(x => BigInt(math.floor(x.toDouble * 1e6 + 0.5).toLong)).toArray)
    val n = BigInt(vecs.length)
    val d = 64
    val sums = Array.fill(d)(BigInt(0))
    for (v <- vecs; i <- 0 until d) sums(i) += v(i)
    for (i <- 0 until d; j <- i until d) {
      val dot = vecs.map(v => v(i) * v(j)).sum
      val (gdot, gcov) = got((i + 1L, j + 1L))
      assert(gdot === dot, s"dot($i,$j)")
      assert(gcov === n * dot - sums(i) * sums(j), s"cov_numer($i,$j)")
      if (i == j) assert(gcov >= 0, s"negative variance numerator at $i")
    }
    // the dot surface stays int64-exact (sub-2^53 margin documented in
    // the scaladoc); cov_numer crosses the gate as an exact digit
    // string, so only canonical-form checks apply to it
    assert(got.values.forall { case (d0, _) =>
      d0.isValidLong && d0.abs < (BigInt(1) << 53) })
    val raw = rows.map(_.getString(3))
    assert(raw.forall(s => s.matches("-?[0-9]+") && // plain digits, no
      (s == "0" || !s.stripPrefix("-").startsWith("0")))) // exponent/pad
  }

  test("embeddingMicros: per-dimension checksums match a driver recompute; " +
      "all-BIGINT output schema") {
    val df = SimilarityOps.embeddingMicros(spark, sf)
    assert(df.schema.fields.map(_.dataType).forall(_ ==
      org.apache.spark.sql.types.LongType))
    val got = df.collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got.size === 64)
    val vecs = Tables.embeddings(spark, sf)
      .select(org.apache.spark.sql.functions.col("embedding")).collect()
      .map(_.getSeq[Float](0)
        .map(x => math.floor(x.toDouble * 1e6 + 0.5).toLong).toArray)
    for (i <- 0 until 64) {
      val (cnt, sm, smm) = got(i + 1L)
      assert(cnt === vecs.length.toLong, s"cnt($i)")
      assert(sm === vecs.map(_(i)).sum, s"sm($i)")
      assert(smm === vecs.map(v => v(i) * v(i)).sum, s"smm($i)")
    }
  }
}
