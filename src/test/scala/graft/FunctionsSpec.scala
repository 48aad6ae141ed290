package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.functions.{BitmapIntersectCount, IndicesToBitmap}

class FunctionsSpec extends SparkSpec {

  test("IndicesToBitmap sets the right bits, ignores out-of-range") {
    val s = spark; import s.implicits._
    val df = Seq((Seq(0, 1, 64, 127, -1, 128), 2)).toDF("idxs", "w")
    val bits = df.select(IndicesToBitmap(col("idxs"), col("w")).as("b"))
      .head().getSeq[Long](0)
    assert(bits === Seq(3L, 1L | (1L << 63)))
  }

  test("BitmapIntersectCount counts shared bits; shorter width wins") {
    val s = spark; import s.implicits._
    val df = Seq(
      (Seq(3L, 5L), Seq(1L, 4L), 2L),       // bits {0,1}∩{0}=1 + {0,2}∩{2}=1
      (Seq(-1L), Seq(-1L), 64L),            // full word overlap
      (Seq(0L, 0L), Seq(-1L, -1L), 0L),     // disjoint
      (Seq(7L, 7L, 7L), Seq(7L), 3L),       // width mismatch → min width
    ).toDF("a", "b", "expect")
    val bad = df.filter(
      BitmapIntersectCount(col("a"), col("b")) =!= col("expect")).count()
    assert(bad === 0)
  }

  test("BitmapIntersectCount: whole-array null propagates; nullable ELEMENTS rejected") {
    val s = spark; import s.implicits._
    val df = Seq((Some(Seq(1L)), Option.empty[Seq[Long]])).toDF("a", "b")
    assert(df.select(BitmapIntersectCount(col("a"), col("b"))).head().isNullAt(0))
    // nullable elements fail at ANALYSIS time (no silent undercount, no
    // per-element branch in the hot pair loop)
    val withNullElem = Seq((Seq(Some(1L), None), Seq(Some(1L), Some(2L))))
      .toDF("a", "b")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      withNullElem.select(BitmapIntersectCount(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.contains("indices_to_bitmap"))
  }

  test("CosineSimilarity: null element nulls the result, like the HOF form") {
    val s = spark; import s.implicits._
    val df = Seq((Seq(Option(1f), None), Seq(Option(1f), Option(0f))))
      .toDF("a", "b")
    val native = df.select(graft.functions.CosineSimilarity(col("a"), col("b"))).head()
    val hof = df.select(graft.operators.SimilarityOps.cosineHof(col("a"), col("b"))).head()
    assert(native.isNullAt(0) && hof.isNullAt(0))
  }

  test("codegen and interpreted paths agree") {
    val s = spark; import s.implicits._
    val df = (0 until 1000).map { i =>
      (Seq(i.toLong, (i * 31).toLong), Seq((i * 17).toLong, i.toLong))
    }.toDF("a", "b")
    val expr = BitmapIntersectCount(col("a"), col("b")).as("c")
    val withCodegen = df.select(expr).collect().map(_.getLong(0)).toSeq
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interpreted = df.select(expr).collect().map(_.getLong(0)).toSeq
      assert(withCodegen === interpreted)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("RollingWindowHashes: O(n) rolling equals per-window recompute; short arrays empty") {
    val s = spark; import s.implicits._
    val mod = 1000000007L
    val base = 1000003
    val k = 8
    def naive(toks: Seq[String]): Seq[Long] = {
      val vals = toks.map(t =>
        graft.functions.RollingHash.hashBytes(t.getBytes("UTF-8"), 31, mod))
      if (vals.length < k) Seq.empty
      else (0 to vals.length - k).map { j =>
        vals.slice(j, j + k).foldLeft(0L)((h, v) => (h * base + v) % mod)
      }
    }
    val rows = (0 until 200).map { i =>
      (i.toLong, (0 until (i % 23)).map(x => s"tok${(x * 7 + i) % 13}"))
    }
    val got = rows.toDF("id", "toks")
      .select(col("id"),
        graft.functions.RollingWindowHashes(col("toks"), k).as("whs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    rows.foreach { case (id, toks) =>
      assert(got(id) === naive(toks), s"id $id (${toks.length} tokens)")
    }
    // codegen vs interpreted agreement
    val expr = graft.functions.RollingWindowHashes(col("toks"), k).as("whs")
    val df = rows.toDF("id", "toks")
    val withCodegen = df.select(expr).collect().map(_.getSeq[Long](0)).toSeq
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      assert(df.select(expr).collect().map(_.getSeq[Long](0)).toSeq === withCodegen)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("WinnowedFingerprints: deque selection equals brute-force robust winnowing") {
    val s = spark; import s.implicits._
    val w = 4
    // brute force: per window, min value with RIGHTMOST tie; dedupe by
    // position (the SIGMOD'03 robust rule, stated directly)
    def naive(vals: Seq[Long]): Seq[(Int, Long)] = {
      if (vals.isEmpty) return Seq.empty
      val m = vals.length
      val windows =
        if (m < w) Seq(vals.indices)
        else (0 to m - w).map(i => i until (i + w))
      windows.map { win =>
        val minV = win.map(vals).min
        val j = win.filter(vals(_) == minV).max // rightmost
        (j, minV)
      }.distinct
    }
    // adversarial shapes: runs of equal values (tie rule), strictly
    // descending (selection moves every window), ascending (never
    // moves), and pseudo-random — plus lengths 0..w+3 for the short
    // single-window rule
    val rows: Seq[(Long, Seq[Long])] =
      (0 until 120).map { i =>
        val n = i % 12
        (i.toLong, (0 until n).map(x => ((x * 2654435761L + i * 97) % 50).abs))
      } ++ Seq(
        (1000L, Seq.fill(9)(7L)),                  // all equal: rightmost each window
        (1001L, (9L to 1L by -1).toSeq),           // descending
        (1002L, (1L to 9L).toSeq),                 // ascending
        (1003L, Seq(5L, 1L, 5L, 1L, 5L, 1L, 5L)))  // alternating ties
    val got = rows.toDF("id", "whs")
      .select(col("id"),
        graft.functions.WinnowedFingerprints(col("whs"), w).as("sel"))
      .collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Row](1).map(x => (x.getInt(0), x.getLong(1))))
      .toMap
    rows.foreach { case (id, vals) =>
      assert(got(id) === naive(vals), s"id $id ($vals)")
    }
    // codegen vs interpreted agreement
    val df = rows.toDF("id", "whs")
    val expr = graft.functions.WinnowedFingerprints(col("whs"), w).as("sel")
    val withCodegen = df.select(expr).collect().map(_.getSeq[Row](0)).toSeq
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      assert(df.select(expr).collect().map(_.getSeq[Row](0)).toSeq === withCodegen)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("BitmapIntersectCount equals the higher-order-function fold") {
    val s = spark; import s.implicits._
    val df = (0 until 500).map { i =>
      (Seq(i.toLong, i.toLong * 1234567, -i.toLong),
       Seq(i.toLong * 7, i.toLong, i.toLong << 3))
    }.toDF("a", "b")
    val hof = aggregate(
      zip_with(col("a"), col("b"), (x, y) => bit_count(x.bitwiseAND(y)).cast("long")),
      lit(0L), (acc, v) => acc + v)
    assert(df.filter(BitmapIntersectCount(col("a"), col("b")) =!= hof).count() === 0)
  }
}
