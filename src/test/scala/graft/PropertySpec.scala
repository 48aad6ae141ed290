package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import org.apache.spark.sql.functions._
import graft.operators.{Cleaning, DedupOps}

/** Property-based invariants (SURVEY.md §5 item 3) over generated
  * frames — the laws the cleaning/dedup operators must hold for ANY
  * input, not just the fixtures. Raw ScalaCheck generators with fixed
  * seeds (the scalatest bridge isn't in the offline dep cache), so
  * every run checks the same deterministic sample set.
  */
class PropertySpec extends SparkSpec {

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(0xC0FFEEL + i)))

  test("dedupFirstKeepFirst: idempotent, one row per key, keeps min arrival") {
    val s = spark; import s.implicits._
    val gen = Gen.listOfN(30, Gen.zip(Gen.oneOf("a", "b", "c", "d"), Gen.chooseNum(0, 1000)))
    for (rows <- samples(gen, 8) if rows.nonEmpty) {
      val df = rows.toDF("k", "arrival")
      val once = Cleaning.dedupFirstKeepFirst(df, Seq("k"), "arrival")
        .collect().map(r => (r.getString(0), r.getInt(1))).toSeq.sorted
      val twice = Cleaning.dedupFirstKeepFirst(
        Cleaning.dedupFirstKeepFirst(df, Seq("k"), "arrival"), Seq("k"), "arrival")
        .collect().map(r => (r.getString(0), r.getInt(1))).toSeq.sorted
      assert(once === twice)                            // idempotence
      assert(once.map(_._1).distinct === once.map(_._1)) // one row per key
      val minByKey = rows.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).min }
      assert(once.toMap === minByKey)                   // first-wins = min arrival
    }
  }

  test("coerceDecimalElseZero: never drops rows, never yields null") {
    val s = spark; import s.implicits._
    val gen = Gen.listOfN(25, Gen.oneOf(
      Gen.const("abc"), Gen.const(""), Gen.const("12.345"),
      Gen.chooseNum(-99999, 99999).map(_.toString),
      Gen.chooseNum(0, 9999999).map(n => s"$n.${n % 100}")))
    for (rows <- samples(gen, 8) if rows.nonEmpty) {
      val df = rows.toDF("raw")
        .select(Cleaning.coerceDecimalElseZero(col("raw")).as("v"))
      assert(df.count() === rows.size)
      assert(df.filter(col("v").isNull).count() === 0)
    }
  }

  test("jaccardNearDupPairs: pairs a<b, values match exact set arithmetic") {
    val s = spark; import s.implicits._
    val shingle = Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff", "gg")
    val gen = Gen.listOfN(8, Gen.nonEmptyListOf(shingle).map(_.distinct))
      .map(_.zipWithIndex.map { case (sh, i) => (i.toLong, sh) })
    for (docs <- samples(gen, 5) if docs.nonEmpty) {
      val df = docs.toDF("doc_id", "sh")
      val got = DedupOps.jaccardNearDupPairs(df, 0.5)
        .select("doc_a", "doc_b", "jaccard")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      val expect = (for {
        (ia, sa) <- docs; (ib, sb) <- docs if ia < ib
        inter = sa.toSet.intersect(sb.toSet).size
        j = inter.toDouble / (sa.toSet ++ sb.toSet).size
        if j >= 0.5
      } yield (ia, ib, j)).sorted
      assert(got.sorted === expect)
    }
  }

  test("connectedComponents: union-find and label propagation agree on random graphs") {
    val s = spark; import s.implicits._
    val vGen = Gen.listOfN(30, Gen.chooseNum(0L, 60L)).map(_.distinct)
    for (seed <- 0 until 4) {
      val verts = samples(vGen, 4)(seed)
      if (verts.size >= 2) {
        val pairGen = Gen.listOfN(20,
          Gen.zip(Gen.oneOf(verts), Gen.oneOf(verts))).map(_.collect {
          case (a, b) if a < b => (a, b)
        }.distinct)
        val pairs = samples(pairGen, 4)(seed)
        val vDf = verts.toDF("doc_id")
        val pDf = pairs.toDF("doc_a", "doc_b")
        def run(threshold: Long) = graft.operators.DedupOps
          .connectedComponents(vDf, pDf, threshold)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
        assert(run(Long.MaxValue) === run(0L), s"strategy mismatch seed=$seed")
      }
    }
  }

  test("packSequencesFor: matches a sequential scan for gappy doc_id sets") {
    val s = spark; import s.implicits._
    // doc_ids with big gaps straddle chunk boundaries (chunk = id div 4096)
    // — exactly where the two-pass prefix sum could misalign
    val idGen = Gen.listOfN(40, Gen.chooseNum(0L, 50000L)).map(_.distinct.sorted)
    val txtGen = Gen.listOfN(40, Gen.chooseNum(0, 12).map(n => Seq.fill(n)("tok").mkString(" ")))
    // 6 genuinely distinct id layouts AND text sets (samples seeds by index)
    val idSets = samples(idGen, 6)
    val txtSets = samples(txtGen, 6)
    for (seed <- 0 until 6) {
      val ids = idSets(seed)
      val txts = txtSets(seed)
      val rows = ids.zip(txts)
      val df = rows.toDF("doc_id", "text")
      val got = graft.operators.CurationOps.packSequencesFor(df)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      // sequential reference: running token offset in doc_id order
      var off = 0L
      val expect = rows.sortBy(_._1).map { case (id, t) =>
        val n = t.split("\\s+").count(_.nonEmpty).toLong
        val r = (id, n, off / 2048, off % 2048)
        off += n
        r
      }
      assert(got === expect, s"seed=$seed ids=${ids.take(5)}…")
    }
  }

  test("splitRecords: inverts RFC 4180 encoding for arbitrary fields") {
    // encode arbitrary field values exactly as a standards-compliant CSV
    // writer would, then assert the splitter recovers record boundaries
    def encodeField(f: String): String =
      if (f.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
        "\"" + f.replace("\"", "\"\"") + "\""
      else f
    val fieldGen = Gen.listOfN(6,
      Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(',', '"', '\n', '\r', ' ', 'é')))
      .map(_.mkString)
    val recordGen = Gen.listOfN(3, fieldGen).map(_.map(encodeField).mkString(","))
    val docGen = Gen.listOfN(5, recordGen)
    for (records <- samples(docGen, 40)) {
      // records containing bare \r would need CR-in-unquoted handling the
      // encoder already prevents: encoded records never contain raw newlines
      val text = records.mkString("\n") + "\n"
      val got = graft.sources.CsvHttpSource.splitRecords(text).filter(_.nonEmpty)
      assert(got === records.filter(_.nonEmpty),
        s"splitRecords mismatch on ${text.take(200)}")
    }
  }

  test("bpeTrainLocal: delta-update trainer equals naive recount on random vocabularies") {
    import graft.operators.TextOps
    // naive recount reference (mirrors TextOpsSpec.seqBpe)
    def naive(words: Seq[(String, Long)], iters: Int): Seq[(Long, String, String, Long)] = {
      var state = words.map { case (w, f) => (w.map(_.toString).toVector, f) }
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
      var it = 1; var done = false
      while (it <= iters && !done) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
          .withDefaultValue(0L)
        for ((syms, f) <- state; i <- 0 until syms.length - 1)
          counts((syms(i), syms(i + 1))) += f
        if (counts.isEmpty) done = true
        else {
          val ((l, r), c) = counts.toSeq
            .sortBy { case ((pl, pr), pc) => (-pc, pl, pr) }.head
          out += ((it.toLong, l, r, c))
          state = state.map { case (syms, f) =>
            val nb = Vector.newBuilder[String]; var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
                nb += l + r; i += 2
              } else { nb += syms(i); i += 1 }
            }
            (nb.result(), f)
          }
          it += 1
        }
      }
      out.toSeq
    }
    val wordGen = Gen.listOfN(40, Gen.zip(
      Gen.listOfN(6, Gen.oneOf('a', 'b', 'c')).map(_.mkString),
      Gen.chooseNum(1L, 9L)))
    for (raw <- samples(wordGen, 10)) {
      val vocab = raw.groupBy(_._1).map { case (w, xs) => (w, xs.map(_._2).sum) }.toSeq
      assert(TextOps.bpeTrainLocal(vocab, 30) === naive(vocab, 30),
        s"delta trainer diverged on ${vocab.take(5)}…")
    }
  }

  test("bpeApplyFor: empty schedule is the identity segmentation; merges only shrink") {
    import graft.operators.TextOps
    val s = spark; import s.implicits._
    val docGen = Gen.listOfN(8,
      Gen.listOfN(5, Gen.oneOf("ab", "ba", "abc", "a", "bb")).map(_.mkString(" ")))
    for (texts <- samples(docGen, 6)) {
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val plain = TextOps.bpeApplyFor(docs, Nil).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      // no merges → one symbol per character of each token
      val expectChars = texts.zipWithIndex.map { case (t, i) =>
        i.toLong -> t.split(" ").filter(_.nonEmpty).map(_.length.toLong).sum
      }.toMap
      plain.foreach { case (id, (_, nBpe)) => assert(nBpe === expectChars(id)) }
      val merged = TextOps.bpeApplyFor(docs, Seq(("a", "b"), ("b", "b"))).collect()
        .map(r => r.getLong(0) -> r.getLong(2)).toMap
      merged.foreach { case (id, n) =>
        assert(n <= plain(id)._2, s"doc $id grew under merges")
        assert(n >= plain(id)._1, s"doc $id shrank below its word count")
      }
    }
  }

  test("substringDedupMetrics: duplicating any doc flags it fully; metrics bounded") {
    import graft.operators.DedupOps
    val s = spark; import s.implicits._
    val docGen = Gen.listOfN(6,
      Gen.listOfN(12, Gen.oneOf("tok1", "tok2", "tok3", "tok4", "x9"))
        .map(_.mkString(" ")))
    for (texts <- samples(docGen, 6)) {
      val base = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      // append an exact copy of doc 0 under a new id
      val docs = (base :+ (100L, texts.head)).toDF("doc_id", "text")
      val got = DedupOps.substringDedupMetrics(docs).collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getInt(5))))
        .toMap
      got.values.foreach { case (nTok, nWin, nDup, cov, keep) =>
        assert(nDup <= nWin && cov >= 0.0 && cov <= 1.0)
        assert((keep == 1) === (cov <= 0.25))
        assert(nWin === math.max(0L, nTok - 7L))
      }
      // the duplicated pair has EVERY window flagged and full coverage
      Seq(0L, 100L).foreach { id =>
        val (nTok, nWin, nDup, cov, keep) = got(id)
        assert(nDup === nWin && nWin > 0, s"doc $id windows not all flagged")
        assert(cov === 1.0 && keep === 0, s"doc $id not fully covered")
      }
    }
  }

  test("misraGries: bounds and heavy-membership hold for arbitrary streams, chunkings, capacities") {
    import graft.operators.TextOps
    // skewed alphabet: a handful of hot tokens + a long tail, so the
    // generated streams actually contain heavy items to protect
    val token = Gen.frequency(
      5 -> Gen.oneOf("hot1", "hot2", "hot3"),
      3 -> Gen.oneOf("warm1", "warm2", "warm3", "warm4"),
      2 -> Gen.chooseNum(1, 200).map(i => s"tail$i"))
    val gen = for {
      n <- Gen.chooseNum(50, 600)
      toks <- Gen.listOfN(n, token)
      k <- Gen.chooseNum(2, 12)
      chunks <- Gen.chooseNum(1, 9) // adversarial "partition" count
    } yield (toks, k, chunks)
    for ((toks, k, chunks) <- samples(gen, 40)) {
      val exact = toks.groupBy(identity).map { case (t, v) => t -> v.size.toLong }
      val n = toks.size.toLong
      val bound = math.ceil(n.toDouble / (k + 1)).toLong
      // per-chunk sequential MG, then the distributed merge — exactly
      // the mgSummaryOf composition, under an arbitrary chunking
      val chunkSize = math.max(1, toks.size / chunks)
      val partial = toks.grouped(chunkSize).toSeq
        .flatMap(c => TextOps.mgSummarize(c.iterator, k))
      val summary = TextOps.mgMerge(partial, k)
      assert(summary.size <= k)
      for ((t, cnt) <- exact) {
        val est = summary.getOrElse(t, 0L)
        assert(est <= cnt, s"k=$k chunks=$chunks: $t overestimated ($est > $cnt)")
        assert(est >= cnt - bound,
          s"k=$k chunks=$chunks: $t est $est below $cnt - $bound")
      }
      // membership: every true heavy item survives the merge
      for ((t, cnt) <- exact if cnt > bound)
        assert(summary.contains(t),
          s"k=$k chunks=$chunks: heavy $t (cnt=$cnt > $bound) evicted")
      // TWO-LEVEL composition — exactly mgSummaryOf's shape at scale:
      // partials are regrouped into ~√chunks intermediate merges, each
      // mgMerge'd to capacity k, then the survivors merge once more.
      // Mergeable-summaries is merge-TREE independent, so the same
      // per-token bounds and the membership guarantee must hold for
      // the deeper tree verbatim.
      val perChunk = toks.grouped(chunkSize).toSeq
        .map(c => TextOps.mgSummarize(c.iterator, k).toSeq)
      val mid = math.max(1, math.sqrt(perChunk.size.toDouble).round.toInt)
      val groupSize = math.max(1, (perChunk.size + mid - 1) / mid)
      val level1 = perChunk.grouped(groupSize).toSeq
        .map(g => TextOps.mgMerge(g.flatten, k).toSeq)
      val twoLevel = TextOps.mgMerge(level1.flatten, k)
      assert(twoLevel.size <= k)
      for ((t, cnt) <- exact) {
        val est = twoLevel.getOrElse(t, 0L)
        assert(est <= cnt, s"k=$k chunks=$chunks 2-level: $t over ($est > $cnt)")
        assert(est >= cnt - bound,
          s"k=$k chunks=$chunks 2-level: $t est $est below $cnt - $bound")
      }
      for ((t, cnt) <- exact if cnt > bound)
        assert(twoLevel.contains(t),
          s"k=$k chunks=$chunks 2-level: heavy $t (cnt=$cnt > $bound) evicted")
      // WEIGHTED composition — exactly mgSummaryOfCounts' shape: each
      // exact (token, cnt) row is a zero-error MG summary of its own
      // sub-stream, chunked arbitrarily (the vocab table's partitioning)
      // and merged through the same two-level tree. Same bounds, same
      // membership guarantee — n is the total WEIGHT, unchanged.
      val countRows = new scala.util.Random(42).shuffle(exact.toSeq)
      val wChunk = math.max(1, countRows.size / chunks)
      val wLevel1 = countRows.grouped(wChunk).toSeq
        .map(g => TextOps.mgMerge(g, k).toSeq)
      val weighted = TextOps.mgMerge(wLevel1.flatten, k)
      assert(weighted.size <= k)
      for ((t, cnt) <- exact) {
        val est = weighted.getOrElse(t, 0L)
        assert(est <= cnt, s"k=$k chunks=$chunks weighted: $t over ($est > $cnt)")
        assert(est >= cnt - bound,
          s"k=$k chunks=$chunks weighted: $t est $est below $cnt - $bound")
      }
      for ((t, cnt) <- exact if cnt > bound)
        assert(weighted.contains(t),
          s"k=$k chunks=$chunks weighted: heavy $t (cnt=$cnt > $bound) evicted")
    }
  }

  test("countMin: est >= exact for EVERY token of arbitrary streams, partition-invariant") {
    import graft.operators.TextOps
    val s = spark; import s.implicits._
    val token = Gen.frequency(
      4 -> Gen.oneOf("hot1", "hot2"),
      3 -> Gen.chooseNum(1, 50).map(i => s"mid$i"),
      2 -> Gen.chooseNum(1, 2000).map(i => s"tail$i"))
    val gen = for {
      n <- Gen.chooseNum(40, 400)
      toks <- Gen.listOfN(n, token)
      parts <- Gen.chooseNum(1, 7)
    } yield (toks, parts)
    for ((toks, parts) <- samples(gen, 6)) {
      val exact = toks.groupBy(identity).map { case (t, v) => t -> v.size.toLong }
      val df = toks.toDF("token").repartition(parts)
      val counters = TextOps.cmsCounters(df).localCheckpoint()
      // counter mass conservation: every row of the sketch sums to n
      val rowSums = counters.groupBy("i").sum("c").collect()
        .map(r => r.getLong(1)).toSeq
      assert(rowSums.size === graft.operators.TextOps.CmsDepth)
      assert(rowSums.forall(_ === toks.size.toLong))
      // one-sided error law for EVERY distinct token, any partitioning
      val est = TextOps.cmsEstimatesAgainst(counters, df.distinct())
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      for ((t, cnt) <- exact) {
        assert(est(t) >= cnt, s"parts=$parts: $t undercounted (${est(t)} < $cnt)")
      }
    }
  }

  test("bloom decontamination: superset law and exact twin on arbitrary corpora") {
    import graft.operators.CurationOps
    val s = spark; import s.implicits._
    // docs ≥13 chars; benchmark membership is the doc_id % 50 == 0 rule,
    // so id 0 and 50 are bench; overlap is planted by COPYING a bench
    // doc's text into a random subset of corpus docs
    val gen = for {
      n <- Gen.chooseNum(55, 110)
      texts <- Gen.listOfN(n, Gen.chooseNum(0, Int.MaxValue)
        .map(x => s"uniq$x " * 4))
      leaks <- Gen.someOf(1L until 49L)
    } yield (texts, leaks.toSet)
    for ((texts, leaks) <- samples(gen, 5)) {
      val docs = texts.zipWithIndex.map { case (t, i) =>
        val id = i.toLong
        // leaked docs embed doc 0's (benchmark) text verbatim
        (id, if (leaks(id)) s"$t ${texts(0)}" else t)
      }.toDF("doc_id", "text")
      val row = CurationOps.bloomDecontamSummary(docs).collect()(0)
      // exact twin recomputed locally with plain substring windows
      def sh(t: String) = (0 to t.length - 13).map(i => t.substring(i, i + 13)).toSet
      val benchSh = texts.indices.filter(_ % 50 == 0)
        .flatMap(i => sh(if (leaks(i.toLong)) s"${texts(i)} ${texts(0)}" else texts(i))).toSet
      val corpusDocs = texts.indices.filter(_ % 50 != 0)
      val exactFlagged = corpusDocs.count { i =>
        val t = if (leaks(i.toLong)) s"${texts(i)} ${texts(0)}" else texts(i)
        sh(t).exists(benchSh)
      }
      assert(row.getLong(0) === corpusDocs.size.toLong, "n_docs")
      assert(row.getLong(1) === exactFlagged.toLong, "n_exact twin")
      assert(row.getBoolean(2), "superset law violated — a true leak was missed")
    }
  }

  test("bloom bitmap is MERGEABLE: OR of arbitrary shard bitmaps equals " +
    "the whole-set bitmap, shards are bitwise subsets") {
    import graft.operators.CurationOps
    val s = spark; import s.implicits._
    val gen = for {
      n <- Gen.chooseNum(30, 150)
      items <- Gen.listOfN(n, Gen.chooseNum(0, Int.MaxValue).map(x => s"item$x"))
      cuts <- Gen.chooseNum(2, 5)
      assign <- Gen.listOfN(n, Gen.chooseNum(0, cuts - 1))
    } yield (items, cuts, assign)
    for ((items, cuts, assign) <- samples(gen, 5)) {
      val whole = CurationOps.bloomBitmapOf(items.toDF("sh"))
      val shardMaps = (0 until cuts).map { c =>
        val shard = items.zip(assign).collect { case (it, a) if a == c => it }
        if (shard.isEmpty) new Array[Long](whole.length)
        else CurationOps.bloomBitmapOf(shard.toDF("sh"))
      }
      // merge law: OR over shards ≡ one-pass bitmap of the union
      val merged = shardMaps.reduce((a, b) => a.zip(b).map { case (x, y) => x | y })
      assert(merged.toSeq === whole.toSeq,
        s"OR-merged shard bitmaps != whole bitmap for $cuts shards")
      // monotonicity: each shard's bits are a subset of the whole's
      for (sm <- shardMaps)
        assert(sm.zip(whole).forall { case (x, w) => (x & ~w) == 0L },
          "a shard set a bit the whole-set bitmap lacks")
    }
  }

  test("countMin counter table is MERGEABLE: per-cell sum of arbitrary " +
    "shard tables equals the whole-stream table, over a two-level tree") {
    import graft.operators.TextOps
    val s = spark; import s.implicits._
    def tableOf(toks: Seq[String]): Map[(Int, Long), Long] =
      if (toks.isEmpty) Map.empty
      else TextOps.cmsCounters(toks.toDF("token")).collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    def merge(ms: Seq[Map[(Int, Long), Long]]): Map[(Int, Long), Long] =
      ms.flatten.groupMapReduce(_._1)(_._2)(_ + _)
    val gen = for {
      n <- Gen.chooseNum(30, 200)
      toks <- Gen.listOfN(n, Gen.frequency(
        3 -> Gen.oneOf("hh1", "hh2"),
        2 -> Gen.chooseNum(1, 300).map(i => s"t$i")))
      cuts <- Gen.chooseNum(2, 5)
      assign <- Gen.listOfN(n, Gen.chooseNum(0, cuts - 1))
    } yield (toks, cuts, assign)
    for ((toks, cuts, assign) <- samples(gen, 4)) {
      val whole = tableOf(toks)
      val shards = (0 until cuts).map(c =>
        toks.zip(assign).collect { case (t, a) if a == c => t })
      val flat = merge(shards.map(tableOf))
      assert(flat === whole, "one-level merged shard tables != whole table")
      // two-level merge tree (the MG discipline): group shards, merge
      // within groups, then merge the group tables — same result
      val grouped = shards.grouped(2).toSeq
        .map(g => merge(g.map(tableOf)))
      assert(merge(grouped) === whole, "two-level merge tree diverged")
    }
  }

  test("HLL sketch is MERGEABLE: union of arbitrary shard sketches " +
    "estimates identically to the whole-stream sketch, over a two-level tree") {
    val s = spark; import s.implicits._
    // register-wise max is associative/commutative/idempotent, so any
    // shard partition and any merge tree must land on the SAME sketch
    // state — estimates compare exactly, not approximately
    def sketchOf(items: Seq[Long]): Array[Byte] =
      items.toDF("v").agg(hll_sketch_agg(col("v"))).head().getAs[Array[Byte]](0)
    def unionOf(sks: Seq[Array[Byte]]): Array[Byte] =
      sks.map(Tuple1(_)).toDF("sk").agg(hll_union_agg(col("sk")))
        .head().getAs[Array[Byte]](0)
    def estOf(sk: Array[Byte]): Long =
      Seq(Tuple1(sk)).toDF("sk")
        .select(hll_sketch_estimate(col("sk"))).head().getLong(0)
    val gen = for {
      n <- Gen.chooseNum(50, 400)
      vals <- Gen.listOfN(n, Gen.chooseNum(1L, 150L)) // dense duplicates
      cuts <- Gen.chooseNum(2, 5)
      assign <- Gen.listOfN(n, Gen.chooseNum(0, cuts - 1))
    } yield (vals, cuts, assign)
    for ((vals, cuts, assign) <- samples(gen, 3)) {
      val whole = sketchOf(vals)
      val shards = (0 until cuts)
        .map(c => vals.zip(assign).collect { case (v, a) if a == c => v })
        .filter(_.nonEmpty)
      val flat = unionOf(shards.map(sketchOf))
      assert(estOf(flat) === estOf(whole), "one-level shard union diverged")
      val grouped = shards.grouped(2).toSeq.map(g => unionOf(g.map(sketchOf)))
      assert(estOf(unionOf(grouped)) === estOf(whole), "two-level merge tree diverged")
      // and the estimate tracks the truth at this density
      val exact = vals.distinct.size.toLong
      assert(math.abs(estOf(whole) - exact) <= math.max(2L, (exact * 0.1).toLong))
    }
  }

  test("unigramViterbi: achieves the brute-force-optimal score on random " +
    "models; segmentation valid; empty iff no full segmentation exists") {
    import graft.operators.TextOps
    val P = TextOps.UnigramMaxPiece
    // brute force: best total score over ALL segmentations into model
    // pieces of length <= P (None if the word cannot be segmented)
    def brute(w: String, lp: Map[String, Long]): Option[Long] = {
      if (w.isEmpty) Some(0L)
      else (1 to math.min(P, w.length)).flatMap { jj =>
        lp.get(w.take(jj)).flatMap(v => brute(w.drop(jj), lp).map(_ + v))
      }.reduceOption(_ max _)
    }
    val gen = for {
      len <- Gen.chooseNum(1, 9)
      w <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c')).map(_.mkString)
      // random model over substrings of w: chars included with prob ~2/3,
      // so some words are UNSEGMENTABLE and the empty-result arm is hit
      subs = (for (i <- 0 until w.length; jj <- 1 to math.min(P, w.length - i))
        yield w.substring(i, i + jj)).distinct
      kept <- Gen.sequence[Seq[Option[String]], Option[String]](
        subs.map(p => Gen.frequency(2 -> Gen.const(Some(p)), 1 -> Gen.const(None))))
      scores <- Gen.listOfN(kept.flatten.size, Gen.chooseNum(-5000000L, -100000L))
    } yield (w, kept.flatten.zip(scores).toMap)
    for ((w, lp) <- samples(gen, 40)) {
      val got = TextOps.unigramViterbi(w, lp)
      brute(w, lp) match {
        case None =>
          assert(got.isEmpty, s"'$w' unsegmentable under $lp but got $got")
        case Some(best) =>
          assert(got.nonEmpty, s"'$w' segmentable (best=$best) but got empty")
          assert(got.mkString === w, s"pieces don't concatenate to '$w': $got")
          assert(got.forall(p => lp.contains(p) && p.length <= P))
          val score = got.map(lp).sum
          assert(score === best,
            s"'$w': Viterbi score $score != brute-force optimum $best ($got)")
      }
    }
  }

  test("wpTrainLocal: delta trainer equals naive recount on random " +
    "vocabularies (likelihood-scored argmax)") {
    import graft.operators.TextOps
    // naive full-recount reference (mirrors WordpieceSpec.naiveTrain):
    // rebuild pair AND unit counts from scratch every round
    def naive(words: Seq[(String, Long)], iters: Int): Seq[TextOps.WpPick] = {
      var state = words.map { case (w, f) => (TextOps.wpInitSyms(w), f) }
      val out = scala.collection.mutable.ArrayBuffer.empty[TextOps.WpPick]
      var it = 1; var done = false
      while (it <= iters && !done) {
        val units = scala.collection.mutable.Map.empty[String, Long]
          .withDefaultValue(0L)
        val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
          .withDefaultValue(0L)
        for ((syms, f) <- state) {
          syms.foreach(s => units(s) += f)
          for (i <- 0 until syms.length - 1) pairs((syms(i), syms(i + 1))) += f
        }
        if (pairs.isEmpty) done = true
        else {
          val (l, r, c, cl, cr) = pairs.iterator
            .map { case ((pl, pr), pc) => (pl, pr, pc, units(pl), units(pr)) }
            .reduce(TextOps.wpBetter _)
          out += TextOps.WpPick(it.toLong, l, r, l + r.drop(2), c, cl, cr)
          state = state.map { case (syms, f) =>
            val nb = Vector.newBuilder[String]; var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
                nb += l + r.drop(2); i += 2
              } else { nb += syms(i); i += 1 }
            }
            (nb.result(), f)
          }
          it += 1
        }
      }
      out.toSeq
    }
    val wordGen = Gen.listOfN(40, Gen.zip(
      Gen.listOfN(6, Gen.oneOf('a', 'b', 'c')).map(_.mkString),
      Gen.chooseNum(1L, 9L)))
    for (raw <- samples(wordGen, 10)) {
      val vocab = raw.groupBy(_._1).map { case (w, xs) => (w, xs.map(_._2).sum) }.toSeq
      assert(TextOps.wpTrainLocal(vocab, 30) === naive(vocab, 30),
        s"wordpiece delta trainer diverged on ${vocab.take(5)}…")
    }
  }

  test("wpGreedySegments: reconstruction, position classes, vocab " +
    "membership; full char coverage never yields UNK") {
    import graft.operators.TextOps
    val gen = for {
      len <- Gen.chooseNum(1, 10)
      w <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c')).map(_.mkString)
      // random vocab over position-classed substrings of w, chars kept
      // with prob 2/3 so the UNK arm is genuinely exercised
      subs = (for (i <- 0 until w.length; jj <- 1 to (w.length - i))
        yield if (i == 0) w.substring(0, jj)
              else "##" + w.substring(i, i + jj)).distinct
      kept <- Gen.sequence[Seq[Option[String]], Option[String]](
        subs.map(p => Gen.frequency(2 -> Gen.const(Some(p)), 1 -> Gen.const(None))))
    } yield (w, kept.flatten.toSet)
    for ((w, vocab) <- samples(gen, 40)) {
      val maxRaw = if (vocab.isEmpty) 1 else vocab.iterator
        .map(p => if (p.startsWith("##")) p.length - 2 else p.length).max
      TextOps.wpGreedySegments(w, vocab, maxRaw) match {
        case Some(ps) =>
          assert(ps.nonEmpty)
          assert(!ps.head.startsWith("##") && ps.tail.forall(_.startsWith("##")))
          assert(ps.forall(vocab))
          val raw = ps.head + ps.tail.map(_.drop(2)).mkString
          assert(raw === w, s"pieces don't reconstruct '$w': $ps")
        case None =>
          // sound only if coverage is incomplete: with EVERY position's
          // single char in vocab, greedy can always advance
          val covered = w.indices.forall { i =>
            vocab(if (i == 0) w.substring(0, 1) else "##" + w.substring(i, i + 1))
          }
          assert(!covered, s"'$w' fully char-covered by $vocab but got UNK")
      }
    }
  }
}
