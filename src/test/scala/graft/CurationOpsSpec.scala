package graft

import org.apache.spark.sql.functions._
import graft.operators.CurationOps

class CurationOpsSpec extends SparkSpec {

  test("decontaminate: flags exactly the corpus docs sharing a 13-gram with the benchmark slice") {
    import graft.operators.{CurationOps, DedupOps}
    val flagged = CurationOps.decontaminate(spark, sf)
      .collect().map(_.getLong(0)).toSet
    // no benchmark doc flags itself, and every flagged doc really does
    // share a shingle (re-derived independently via a plain join)
    assert(flagged.forall(_ % 50 != 0))
    val docs = Tables.documents(spark, sf)
      .filter(org.apache.spark.sql.functions.length(col("text")) >= 13)
    val bsh = docs.filter(col("doc_id") % 50 === 0)
      .select(explode(DedupOps.shingles(col("text"), 13)).as("sh")).distinct()
    val naive = docs.filter(col("doc_id") % 50 =!= 0)
      .select(col("doc_id"), explode(DedupOps.shingles(col("text"), 13)).as("sh"))
      .join(bsh, "sh").select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(flagged === naive)
    assert(flagged.nonEmpty) // the planted dup structure guarantees overlap
  }

  test("sampleStratified: deterministic, bucket bound respected per stratum") {
    val a = CurationOps.sampleStratified(spark, sf).collect()
    val b = CurationOps.sampleStratified(spark, sf).collect()
    assert(a.toSeq === b.toSeq) // hash sampling is reproducible
    assert(a.forall { r =>
      val bucket = r.getLong(2)
      bucket < (if (r.getString(1) == "en") 50 else 20)
    })
    assert(a.nonEmpty && a.length < 500) // actually sampled
  }

  test("packSequences: offsets within budget, stream positions contiguous") {
    val p = CurationOps.packSequences(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(p.forall { case (_, _, _, off) => off >= 0 && off < 2048 })
    // reconstruct stream starts; must equal running sum of predecessors
    var expectedStart = 0L
    p.sortBy(_._1).foreach { case (_, n, bin, off) =>
      assert(bin * 2048 + off === expectedStart)
      expectedStart += n
    }
    // bins are non-decreasing in doc order
    val bins = p.sortBy(_._1).map(_._3)
    assert(bins === bins.sorted)
  }

  test("CurationPipeline: funnel shrinks monotonically, packing covers the survivors") {
    val flow = graft.operators.CurationPipeline.run(spark, sf)
    val nRaw = flow.raw.count()
    val nExact = flow.exactKept.count()
    val nNd = flow.neardupKept.count()
    val nSampled = flow.sampled.count()
    assert(nRaw >= nExact && nExact >= nNd && nNd >= nSampled)
    assert(nExact < nRaw) // testdata plants exact dups
    assert(nSampled > 0)
    // packed output: exactly one row per curated doc, offsets in budget
    assert(flow.packed.count() === nSampled)
    assert(flow.packed.filter(col("bin_offset") >= 2048 || col("bin_offset") < 0).count() === 0)
    // stream is contiguous: total tokens == final doc's start + its tokens
    val last = flow.packed.orderBy(col("doc_id").desc).limit(1)
      .select(col("bin_id") * 2048 + col("bin_offset") + col("n_tokens")).head().getLong(0)
    val total = flow.packed.agg(sum("n_tokens")).head().getLong(0)
    assert(last === total)
  }

  test("packSequences: plan has no single-partition (unpartitioned) window") {
    val plan = CurationOps.packSequences(spark, sf).queryExecution.optimizedPlan
    val unpartitioned = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.isEmpty => w
    }
    assert(unpartitioned.isEmpty,
      "global Window.orderBy with no partitionBy drags the corpus to one partition")
  }

  test("mixturePlan: shares sum to 1, rates bounded, budget respected") {
    val rows = CurationOps.mixturePlan(spark, sf).collect()
    val srcs = Tables.documents(spark, sf).select("source").distinct().count()
    assert(rows.length === srcs)
    val shareSum = rows.map(_.getDouble(3)).sum
    assert(math.abs(shareSum - 1.0) < 1e-4, s"shares sum to $shareSum")
    assert(rows.forall(r => r.getDouble(4) > 0 && r.getDouble(4) <= 1.0))
    // expected sampled tokens land at/under the half-corpus budget
    // (under when any source saturates at rate 1.0)
    val totTok = rows.map(_.getLong(2)).sum.toDouble
    val expected = rows.map(r => r.getLong(2) * r.getDouble(4)).sum
    assert(expected <= 0.5 * totTok + 1, s"$expected over budget ${0.5 * totTok}")
    // temperature flattening: smaller sources get HIGHER keep-rates
    val byTok = rows.sortBy(_.getLong(2))
    assert(byTok.head.getDouble(4) >= byTok.last.getDouble(4))
  }

  test("decontaminateFuzzy catches a paraphrase the exact n-gram check is blind to") {
    import graft.operators.DedupOps
    val s = spark; import s.implicits._
    val benchText =
      "quicks browns jumped behind marble gardens humble catlike wonder painted"
    // every adjacent word pair reordered: high 5-char-shingle overlap,
    // but no 13-char run survives intact
    val para =
      "browns quicks behind jumped gardens marble catlike humble painted wonder"
    val clean =
      "entirely different content about streaming shuffle partitions and codegen"
    val bench = Seq((100L, benchText)).toDF("doc_id", "text")
    val corpus = Seq((1L, para), (2L, clean)).toDF("doc_id", "text")
    // the EXACT decontamination signal (shared 13-char shingle) is zero
    val b13 = bench.select(explode(DedupOps.shingles(col("text"), 13)).as("sh"))
    val p13 = corpus.filter($"doc_id" === 1L)
      .select(explode(DedupOps.shingles(col("text"), 13)).as("sh"))
    assert(p13.join(b13, Seq("sh")).count() === 0,
      "fixture broken: paraphrase shares a 13-char run with the benchmark")
    // the fuzzy net flags exactly the paraphrase, ranked by Jaccard
    val got = CurationOps.decontaminateFuzzyMetrics(corpus, bench).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(_._1).toSeq === Seq(1L), s"flagged ${got.toSeq}")
    assert(got.head._2 === 1L)
    assert(got.head._3 >= CurationOps.FuzzyDecontamJaccard)
    // corpus-keyed run: triage-list invariants
    val run = CurationOps.decontaminateFuzzy(spark, sf).collect()
    assert(run.nonEmpty)
    assert(run.forall(r =>
      r.getDouble(2) >= CurationOps.FuzzyDecontamJaccard && r.getLong(1) >= 1L))
  }

  test("mixturePlan: a zero-token source pins rate to 0 instead of 0/0") {
    val s = spark; import s.implicits._
    val docs = Seq(
      ("srcA", "some spark tokens here"), ("srcA", "more words arrive"),
      ("srcB", "!!! ??? ..."), ("srcB", "")) // srcB tokenizes to NOTHING
      .toDF("source", "text")
    val got = CurationOps.mixturePlanFor(docs).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got("srcB")._1 === 0L)
    assert(got("srcB")._3 === 0.0) // pinned — NaN would break the oracle compare
    assert(got.values.forall(v => !v._2.isNaN && !v._3.isNaN))
    assert(got("srcA")._3 > 0.0)
    // all-zero corpus: w_sum = 0, so share (not just rate) hits 0/0 — both
    // must pin to 0 rather than NaN
    val empty = CurationOps.mixturePlanFor(
      Seq(("srcA", "..."), ("srcB", "")).toDF("source", "text")).collect()
    assert(empty.length === 2)
    empty.foreach { r =>
      assert(r.getDouble(3) === 0.0 && r.getDouble(4) === 0.0,
        s"share/rate must pin to 0 for ${r.getString(0)}")
    }
  }

  test("chunkDocs: chunks reconstruct every document's token stream exactly") {
    import graft.operators.TextOps
    val overlap = CurationOps.ChunkMaxTokens - CurationOps.ChunkStride
    val expected = Tables.documents(spark, sf)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val chunks = CurationOps.chunkDocs(spark, sf).collect()
      .groupBy(_.getLong(0))
    assert(chunks.keySet === expected.keySet)
    chunks.foreach { case (doc, rs) =>
      val ordered = rs.sortBy(_.getLong(1))
      assert(ordered.map(_.getLong(1)).toSeq === ordered.indices.map(_.toLong),
        s"doc $doc chunk ids not consecutive")
      // all chunks but the last are full-size
      assert(ordered.dropRight(1).forall(
        _.getLong(2) === CurationOps.ChunkMaxTokens.toLong), s"doc $doc")
      val rebuilt = ordered.zipWithIndex.flatMap { case (r, i) =>
        val toks = r.getString(3).split(" ").toSeq.filter(_.nonEmpty)
        assert(toks.length === r.getLong(2), s"doc $doc chunk $i length")
        // every non-first chunk follows a FULL chunk, so its first
        // `overlap` tokens are always duplicates (a short chunk can
        // only be last — drop() past its end is simply empty)
        if (i == 0) toks else toks.drop(overlap)
      }
      assert(rebuilt === expected(doc), s"doc $doc reconstruction")
    }
  }

  test("PII patterns: emails and long numbers redacted, short numbers kept") {
    val s = spark; import s.implicits._
    val got = Seq("mail me: a.b+c@x-corp.io or call 12345678 ext 42")
      .toDF("text")
      .select(
        size(regexp_extract_all(col("text"), lit(CurationOps.emailPattern), lit(0))).as("e"),
        size(regexp_extract_all(col("text"), lit(CurationOps.longNumberPattern), lit(0))).as("n"),
        regexp_replace(
          regexp_replace(col("text"), CurationOps.emailPattern, "<EMAIL>"),
          CurationOps.longNumberPattern, "<NUM>").as("scrubbed"))
      .head()
    assert(got.getInt(0) === 1)
    assert(got.getInt(1) === 1)
    assert(got.getString(2) === "mail me: <EMAIL> or call <NUM> ext 42")
  }

  test("dsirWeights: keep is exactly the top quartile, ratios bounded, target scores higher") {
    val rows = CurationOps.dsirWeights(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(rows.nonEmpty)
    // c_t <= c_r in every bucket, so no per-bucket ratio (and hence no
    // mean of them) can exceed the 10^6 micro unit
    assert(rows.forall { case (_, nf, micro, _) => nf >= 1 && micro <= 1000000L })
    // keep == (score >= exact 75th percentile), recomputed independently
    val scores = rows.map(_._3).sorted
    val rank = 0.75 * (scores.length - 1)
    val (lo, hi) = (scores(rank.toInt), scores(math.ceil(rank).toInt))
    val thr = BigDecimal(lo + (rank - rank.toInt) * (hi - lo))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(rows.forall { case (_, _, micro, keep) => keep === (micro >= thr) })
    assert(rows.count(_._4) >= scores.length / 4) // quartile ties round up
    // the model separates: target-language docs average a higher ratio
    val lang = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val (en, other) = rows.partition(r => lang(r._1) == "en")
    def mean(xs: Array[(Long, Long, Long, Boolean)]) =
      xs.map(_._3).sum.toDouble / xs.length
    assert(mean(en) > mean(other))
  }

  test("clusterBalance: rates flatten clusters toward the uniform budget, keep is the hash predicate") {
    val rows = CurationOps.clusterBalance(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    assert(rows.nonEmpty)
    val n = rows.length.toLong
    val clusters = rows.groupBy(_._2)
    val k = clusters.size.toLong
    val target = (n + k - 1) / k
    for ((cell, members) <- clusters) {
      val nCell = members.head._3
      assert(nCell === members.length.toLong, s"cell $cell count")
      val rate = members.head._4
      assert(members.forall(m => m._3 == nCell && m._4 == rate))
      assert(rate === math.min(100L, 100L * target / nCell), s"cell $cell rate")
      // a cluster under budget keeps everything; one over budget is cut
      if (nCell <= target) assert(rate === 100L && members.forall(_._5))
    }
    // keep == the stratifiedFilter md5 predicate, recomputed independently
    def bucket(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % 100
    }
    assert(rows.forall { case (id, _, _, rate, keep) => keep === (bucket(id) < rate) })
  }

  test("clusterTopics: every cell labeled with ≤3 dense-ranked terms, scores " +
      "non-increasing, one cell's scores replay from a driver tf·idf recompute") {
    val rows = CurationOps.clusterTopics(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    val idx = graft.operators.SimilarityOps.ensureIvfTrainedIndex(spark, sf)
    val allCells = spark.table(idx).select("cell").distinct()
      .collect().map(_.getLong(0)).toSet
    val byCell = rows.groupBy(_._1)
    assert(byCell.keySet === allCells, "every trained cell must be labeled")
    for ((cell, rs) <- byCell) {
      val ranks = rs.map(_._2).sorted.toSeq
      assert(ranks === (1L to rs.length).toSeq, s"cell $cell ranks not dense")
      assert(rs.length <= 3)
      val scoresByRank = rs.sortBy(_._2).map(_._4).toSeq
      assert(scoresByRank === scoresByRank.sorted.reverse, s"cell $cell order")
    }
    // independent recompute for the first cell: members' summed tf,
    // corpus df, round-6 tf·ln(N/df) — the tfidfTopTerms discipline
    val cell0 = byCell.keySet.min
    val members = spark.table(idx).filter(col("cell") === cell0)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def toks(t: String): Seq[String] =
      t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
    val nDocs = docs.size.toDouble
    val df = docs.values.flatMap(t => toks(t).distinct)
      .groupBy(identity).map { case (k, v) => k -> v.size.toDouble }
    val ctf = members.toSeq.flatMap(id => docs.get(id).toSeq.flatMap(toks))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val expect = ctf.map { case (t, c) =>
      t -> BigDecimal(c.toDouble * math.log(nDocs / df(t)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toSeq.sortBy { case (t, s) => (-s, t) }.take(3)
    val got = byCell(cell0).sortBy(_._2).map(r => (r._3, r._4)).toSeq
    assert(got === expect, s"cell $cell0 labels diverge from the recompute")
  }

  test("bloom decontamination: planted leak flagged, clean corpus under the FP budget, corpus booleans green") {
    val s = spark; import s.implicits._
    // 102 docs: ids 0,50,100 are benchmark (doc_id % 50 == 0); doc 7
    // copies a 13-gram run from doc 50 — Bloom must flag it (superset
    // is structural). Filler interleaves the doc id into every token so
    // NO 13-char window is shared across docs (windows span < 13 chars
    // of constant text between two id occurrences).
    def filler(id: Long) =
      ('a' to 'j').map(c => s"$c$id$c$id").mkString(" ")
    val leak = "SHAREDBENCHRUN"  // 14 chars → ≥2 shared 13-grams
    val docs = (0L until 102L).map { id =>
      val t = if (id == 50) s"benchmark item $leak end of item"
      else if (id == 7) s"contaminated copy $leak trailing words"
      else filler(id)
      (id, t)
    }.toDF("doc_id", "text")
    val row = CurationOps.bloomDecontamSummary(docs).collect()(0)
    assert(row.getLong(0) === 99L)     // 102 − 3 benchmark docs
    assert(row.getLong(1) === 1L)      // exactly the planted leak doc
    assert(row.getBoolean(2), "superset_ok — Bloom missed a true leak")
    assert(row.getBoolean(3), "fp_ok")
    // all-clean corpus: no benchmark shingle appears elsewhere → exact 0,
    // and Bloom false positives stay under the 5% budget
    val clean = (0L until 102L).map(id => (id, filler(id))).toDF("doc_id", "text")
    val rc = CurationOps.bloomDecontamSummary(clean).collect()(0)
    assert(rc.getLong(1) === 0L)
    assert(rc.getBoolean(2) && rc.getBoolean(3))
    // corpus booleans green at sf0.001 (the driver gate re-checks at sf0.01)
    val rs = CurationOps.decontaminateBloomGated(spark, sf).collect()(0)
    assert(rs.getBoolean(2) && rs.getBoolean(3))
  }

  test("domainCaps: exactly cap longest docs per source, deterministic " +
    "ties, WindowGroupLimit pre-filters before the shuffle") {
    val df = CurationOps.domainCaps(spark, sf)
    val got = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // recompute locally from the table
    val docs = Tables.documents(spark, sf)
      .select("source", "doc_id", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expect = docs.groupBy(_._1).toSeq.flatMap { case (src, rows) =>
      rows.sortBy { case (_, id, n) => (-n, id) }
        .take(CurationOps.DomainCap).zipWithIndex
        .map { case ((s, id, n), i) => (s, id, n, (i + 1).toLong) }
    }.sortBy(t => (t._1, t._4))
    assert(got.toSeq === expect)
    // the cap binds on this corpus (25 docs/source at sf0.001)
    assert(got.groupBy(_._1).forall(_._2.length == CurationOps.DomainCap))
    // scale shape: the rank filter runs BEFORE the exchange
    val plan = df.queryExecution.sparkPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected a WindowGroupLimit pre-shuffle filter:\n$plan")
  }
}
