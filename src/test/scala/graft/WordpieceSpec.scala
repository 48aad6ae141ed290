package graft

import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** WordPiece tokenizer (BERT family): fixture-level proofs of the
  * pieces the driver's oracle gate exercises end-to-end — the exact
  * rational (likelihood) argmax and its tie-break, delta-trainer ≡
  * naive-recount equality, tier-1 ≡ tier-2 equality, and the greedy
  * matcher's longest-match / [UNK] semantics.
  */
class WordpieceSpec extends SparkSpec {

  /** Naive full-recount sequential reference: recompute pair and unit
    * counts from scratch every round — the recurrence the DuckDB
    * oracle unrolls, with none of wpTrainLocal's delta shortcuts. */
  private def naiveTrain(vocab: Seq[(String, Long)], iters: Int)
      : Seq[TextOps.WpPick] = {
    var syms = vocab.map(t => TextOps.wpInitSyms(t._1))
    val freqs = vocab.map(_._2)
    val out = scala.collection.mutable.ArrayBuffer.empty[TextOps.WpPick]
    var it = 1
    var done = false
    while (it <= iters && !done) {
      val units = scala.collection.mutable.Map.empty[String, Long]
        .withDefaultValue(0L)
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      for ((s, f) <- syms.zip(freqs)) {
        s.foreach(x => units(x) += f)
        for (i <- 0 until s.length - 1) pairs((s(i), s(i + 1))) += f
      }
      if (pairs.isEmpty) done = true
      else {
        val (l, r, c, cl, cr) = pairs.iterator
          .map { case ((pl, pr), pc) => (pl, pr, pc, units(pl), units(pr)) }
          .reduce(TextOps.wpBetter _)
        val prod = l + r.drop(2)
        out += TextOps.WpPick(it.toLong, l, r, prod, c, cl, cr)
        syms = syms.map { s =>
          val nb = Vector.newBuilder[String]
          var i = 0
          while (i < s.length) {
            if (i + 1 < s.length && s(i) == l && s(i + 1) == r) {
              nb += prod; i += 2
            } else { nb += s(i); i += 1 }
          }
          nb.result()
        }
        it += 1
      }
    }
    out.toSeq
  }

  test("wpBetter picks by likelihood score, not raw pair count") {
    // (a,##b): c=100 but ubiquitous units 1000·1000 → score 1e-4;
    // (c,##d): c=10 over rare units 10·10 → score 0.1 — must win
    val hi = ("c", "##d", 10L, 10L, 10L)
    val lo = ("a", "##b", 100L, 1000L, 1000L)
    assert(TextOps.wpBetter(lo, hi) === hi)
    assert(TextOps.wpBetter(hi, lo) === hi)
    // exact tie (same rational) → (l, r) ascending wins
    val t1 = ("a", "##b", 10L, 10L, 10L)
    val t2 = ("a", "##c", 100L, 100L, 10L) // 100/(100·10) == 10/(10·10)
    assert(TextOps.wpBetter(t1, t2) === t1)
    assert(TextOps.wpBetter(t2, t1) === t1)
  }

  // fixture where score order ≠ count order: 'qu'-style exclusive pairs
  // (rare but always together) must merge before frequent-but-mixed ones
  private def fixtureTypes: Seq[(String, Long)] = Seq(
    ("queen", 40L), ("quilt", 35L), ("the", 900L), ("then", 500L),
    ("than", 450L), ("that", 800L), ("table", 300L), ("tablet", 200L),
    ("stable", 150L), ("ablest", 90L), ("est", 60L), ("best", 70L),
    ("quest", 25L), ("net", 400L), ("ten", 380L), ("tent", 120L))

  test("delta trainer ≡ naive full recount on the fixture; 'qu' merges " +
    "first despite tiny count") {
    val local = TextOps.wpTrainLocal(fixtureTypes, 20)
    assert(local === naiveTrain(fixtureTypes, 20))
    assert(local.size === 20)
    // the WordPiece signature: exclusive pairs score 1/count and beat
    // every high-count mixed pair. (##u,##i) and (q,##u) tie exactly at
    // 1/100 — the BigInt cross-multiplied tie-break picks (##u,##i)
    // lexicographically, deterministically in both engines
    assert((local.head.l, local.head.r) === ("##u", "##i"),
      s"expected (##u,##i) first, got ${local.head}")
    // rare-but-exclusive (q,##u) (c=65, score 1/100) is pick #2, while
    // the corpus's HIGHEST-count pair (t,##h, c=2650, score 1/3650) is
    // never picked at all — a count-ordered trainer (BPE) would take
    // (t,##h) first, so the fixture proves the score order is live
    assert((local(1).l, local(1).r) === ("q", "##u"))
    assert(!local.exists(x => (x.l, x.r) == ("t", "##h")),
      s"(t,##h) should lose to exclusive pairs throughout: $local")
    // products carry '##' iff their left operand did
    assert(local.forall(p => p.piece == p.l + p.r.drop(2)))
  }

  test("tier-1 (driver deltas) ≡ tier-2 (distributed one-merge rounds) " +
    "on the fixture") {
    val s = spark
    import s.implicits._
    val local = TextOps.wpTrainLocal(fixtureTypes, 12)
    val dist = TextOps.wpTrainDistributed(fixtureTypes.toDF("w", "freq"), 12)
    assert(local === dist)
  }

  test("trainer exhausts gracefully when every word is fully merged") {
    val tiny = Seq(("ab", 10L), ("cd", 5L))
    val picks = TextOps.wpTrainLocal(tiny, 50)
    assert(picks.size === 2) // one merge per word shape, then no pairs
    val s = spark
    import s.implicits._
    assert(TextOps.wpTrainDistributed(tiny.toDF("w", "freq"), 50) === picks)
  }

  test("wpGreedy: longest match first, [UNK] on unseen char and on " +
    "over-long words") {
    val vocab = Set("a", "##a", "##b", "ab", "abc", "##bc")
    // greedy takes "abc" whole, not "ab"+"##c" (which would fail anyway)
    assert(TextOps.wpGreedy("abc", vocab, 3) === (1L, 0L))
    // "abab" → "ab" + "##a"? no: after "ab", need continuations:
    // "##a" then "##b" → 3 pieces
    assert(TextOps.wpGreedy("abab", vocab, 3) === (3L, 0L))
    // "abbc" → "ab" + "##bc" → 2 pieces (longest continuation wins)
    assert(TextOps.wpGreedy("abbc", vocab, 3) === (2L, 0L))
    // unseen char anywhere → whole word is one [UNK]
    assert(TextOps.wpGreedy("abz", vocab, 3) === (1L, 1L))
    // over the word cap → [UNK] without matching at all
    assert(TextOps.wpGreedy("a" * (TextOps.WpMaxWord + 1), vocab, 3) === (1L, 1L))
    // exactly at the cap is segmented normally
    assert(TextOps.wpGreedy("a" * TextOps.WpMaxWord, vocab, 3)
      === (TextOps.WpMaxWord.toLong, 0L))
  }

  test("wordpieceApply on the documents table recomputes from per-type " +
    "greedy matching under the trained vocab") {
    val docs = Tables.documents(spark, sf)
    val words = docs.select(explode(TextOps.tokens(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
    val sched = TextOps.wpTrainSchedule(words, TextOps.WpIters)
    val alpha = words.collect().map(_.getString(0))
      .flatMap(TextOps.wpInitSyms).toSet
    val vocab = alpha ++ sched.map(_.piece)
    val maxRaw = vocab.iterator
      .map(p => if (p.startsWith("##")) p.length - 2 else p.length).max
    val got = TextOps.wordpieceApply(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val expect = docs.select(col("doc_id"), TextOps.tokens(col("text")).as("ts"))
      .collect().map { r =>
        val ws = r.getSeq[String](1)
        val per = ws.map(w => TextOps.wpGreedy(w, vocab, maxRaw))
        r.getLong(0) -> (ws.length.toLong, per.map(_._1).sum, per.map(_._2).sum)
      }.toMap
    assert(got === expect)
    // the corpus-trained vocab covers the corpus: no [UNK] on real data
    assert(got.values.forall(_._3 == 0L))
    // merges genuinely compress: pieces < chars overall
    val nChars = docs.select(sum(length(concat_ws("", TextOps.tokens(col("text"))))))
      .collect()(0).getLong(0)
    assert(got.values.map(_._2).sum < nChars)
  }
}
