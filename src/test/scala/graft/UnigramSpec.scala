package graft

import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** Unigram-LM tokenizer (SentencePiece-style hard-EM): fixture-level
  * proofs of the pieces the driver's oracle gate exercises end-to-end —
  * Viterbi tie-breaks, the character-coverage floor, the word-length
  * cap, and tier-1 (driver EM) ≡ tier-2 (distributed E-step) equality
  * on a corpus where multi-char pieces genuinely win.
  */
class UnigramSpec extends SparkSpec {

  test("unigramViterbi: longest piece wins score ties; unreachable word " +
    "yields the empty segmentation") {
    // "ab" as one piece vs "a"+"b": lp(ab) == lp(a)+lp(b) → tie → the
    // 2-char piece must win (the oracle checks lengths descending with >=)
    val lp = Map("a" -> -500000L, "b" -> -500000L, "ab" -> -1000000L)
    assert(TextOps.unigramViterbi("ab", lp) === List("ab"))
    // strictly better short split must beat a longer piece
    val lp2 = Map("a" -> -100000L, "b" -> -100000L, "ab" -> -1000000L)
    assert(TextOps.unigramViterbi("ab", lp2) === List("a", "b"))
    // a char with no model entry makes the word end-unreachable → empty
    assert(TextOps.unigramViterbi("axb", lp) === Nil)
    // feasible prefix + infeasible tail is still empty (end unreachable)
    assert(TextOps.unigramViterbi("abx", lp) === Nil)
  }

  test("unigramViterbi picks the max-score segmentation, not greedy") {
    // greedy longest-first would take "abc" then be stuck with "d" at
    // lp(d) very low; optimal is "ab"+"cd"
    val lp = Map("abc" -> -100000L, "d" -> -5000000L,
      "ab" -> -600000L, "cd" -> -600000L,
      "a" -> -2000000L, "b" -> -2000000L, "c" -> -2000000L)
    assert(TextOps.unigramViterbi("abcd", lp) === List("ab", "cd"))
  }

  // deterministic synthetic corpus, richer than the 31-type testdata
  // vocabulary: 300 pseudo-words over a 12-char alphabet with heavy
  // shared affixes so the seed/prune caps and the char floor all bind
  private def fixtureTypes: Seq[(String, Long)] = {
    val alpha = "abcdefghijkl"
    (0 until 300).map { i =>
      val stem = Seq(alpha(i % 12), alpha((i / 2) % 12), alpha((i / 5) % 12)).mkString
      val affix = if (i % 3 == 0) "ing" else if (i % 3 == 1) "ed" else "er"
      (stem + affix, (i % 7 + 1).toLong)
    }.distinctBy(_._1).map { case (w, f) => (w, f) }
  }

  test("tier-1 (driver EM) and tier-2 (distributed E-step) train the " +
    "same model on a fixture corpus") {
    val s = spark
    import s.implicits._
    val types = fixtureTypes
    val local = TextOps.unigramTrainLocal(types)
    val dist = TextOps.unigramTrainDistributed(
      types.toDF("w", "freq"))
    assert(local === dist)
    assert(local.nonEmpty)
    // multi-char pieces actually learned (the corpus is built for it)
    assert(local.exists(_._1.length > 1), s"no multi-char piece in $local")
    // every single char of the corpus is in the model (coverage floor)
    val chars = types.flatMap(_._1.toSeq).map(_.toString).toSet
    assert(chars.subsetOf(local.map(_._1).toSet))
    // the prune cap binds: kept set is exactly vocab-cap ∪ chars
    assert(local.size <= TextOps.UnigramVocabSize + chars.size)
  }

  test("model lp is lpn(cnt) - lpn(total) over the kept set") {
    val m = TextOps.unigramTrainLocal(fixtureTypes)
    val total = m.map(_._2).sum
    m.foreach { case (_, c, lp) =>
      assert(lp === TextOps.lpnMicro(c) - TextOps.lpnMicro(total))
    }
  }

  test("words over the length cap are excluded from training and " +
    "char-fallback at apply") {
    val long = "a" * (TextOps.UnigramMaxWord + 3)
    val base = fixtureTypes
    val withLong = base :+ (long -> 1000000L)
    // the long word's enormous freq must not move the model at all
    assert(TextOps.unigramTrainLocal(base) === TextOps.unigramTrainLocal(withLong))
  }

  test("char floor: a char fully absorbed into multi-char pieces stays " +
    "in the model with cnt 1") {
    // every 'b' occurs only inside the very frequent piece "ab", so
    // after EM its Viterbi count is 0 → floored to 1, never dropped
    val types = Seq(("ab", 1000L), ("aab", 900L), ("aaab", 800L))
    val m = TextOps.unigramTrainLocal(types)
    val b = m.find(_._1 == "b")
    assert(b.isDefined, s"char 'b' dropped from $m")
    if (m.exists(p => p._1.length > 1 && p._1.endsWith("b")))
      assert(b.get._2 === 1L, s"expected floored cnt 1 for 'b' in $m")
  }

  test("unigramApply on the documents table: n_pieces recomputes from " +
    "per-word Viterbi under the trained model") {
    val docs = Tables.documents(spark, sf)
    val words = docs.select(explode(TextOps.tokens(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
    val model = TextOps.unigramTrainFull(words)
    val lp = model.map(t => t._1 -> t._3).toMap
    val got = TextOps.unigramApply(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val expect = docs.select(col("doc_id"), TextOps.tokens(col("text")).as("ts"))
      .collect().map { r =>
        val ws = r.getSeq[String](1)
        val np = ws.map { w =>
          if (w.length > TextOps.UnigramMaxWord) w.length.toLong
          else TextOps.unigramViterbi(w, lp).length.toLong
        }.sum
        r.getLong(0) -> (ws.length.toLong, np)
      }.toMap
    assert(got === expect)
    // pieces strictly compress vs chars somewhere (the model is useful)
    assert(got.values.map(_._2).sum > 0)
  }
}
