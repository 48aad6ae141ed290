package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.DedupOps

/** Flipped-scale validation harness for the three adaptive strategy
  * gates in the dedup family. Every gate is spec-forced on both
  * branches at test scale, but until this harness none had *executed*
  * on data that NATURALLY crosses it — the exact blind spot a
  * strategy crossover bug would live in. Two synthetic corpora (built
  * once under /tmp, deterministic md5-derived text so re-runs are
  * identical) cross the gates from above:
  *
  *  - corpus A (100K docs, ~4M shingle vocab, ~2.4M true near-dup
  *    pairs): vocab ≫ 64K flips jaccardNearDupPairs to the
  *    PREFIX-FILTER path; the verified pair list > 2M edges flips
  *    connectedComponents to DISTRIBUTED min-label propagation.
  *    Groups are 50 mutated copies of a per-group base text (unique
  *    md5 chains → genuinely sparse vocabulary, the regime the sparse
  *    path exists for; within-group Jaccard ≈ 0.72).
  *  - corpus B (12K docs, ~58K vocab ≤ 64K): the bitmap VERIFICATION
  *    path fires, but its bitmap table (~87 MB > the 64 MB broadcast
  *    budget) flips verifyCandidatesExact to the SHUFFLE-join probe.
  *    Suffix tokens draw from a 499-token pool so vocabulary stays
  *    under the bitmap gate while every copy still differs.
  *
  * Correctness at the flipped scale is checked WITHIN Spark (DuckDB
  * oracles are quadratic in these corpus sizes): corpus A's
  * distributed CC labels must equal the driver union-find's on the
  * same 2.4M-edge graph; corpus B's shuffle-verified pairs must equal
  * an independent array_intersect verification of the same candidates.
  * Results are recorded in BASELINE.md §crossovers.
  */
object CrossoverBench {

  private def timed[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[xover] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    r
  }

  /** Corpus A: 2000 groups × 50 copies; per-group unique base (6 md5
    * chunks, 192 chars) + per-copy unique 32-char md5 suffix.
    */
  private def genCorpusA(spark: SparkSession, path: String): Unit = {
    val nGroups = 2000L; val copies = 50L
    val base = concat((0 until 6).map(k =>
      md5(concat(col("g").cast("string"), lit(s"-$k")))): _*)
    spark.range(nGroups * copies)
      .select(col("id").as("doc_id"), (col("id") / copies).cast("long").as("g"))
      .withColumn("text", concat(base, lit(" "), md5(col("doc_id").cast("string"))))
      .select(col("doc_id"), col("text"))
      .write.mode("overwrite").parquet(path)
  }

  /** Corpus B: 240 groups × 50 copies; shorter unique base (5 chunks,
    * 160 chars), fixed " ---- " sentinel (keeps boundary shingles off
    * the per-copy vocabulary), pool-drawn suffix (499 tokens).
    */
  private def genCorpusB(spark: SparkSession, path: String): Unit = {
    val nGroups = 240L; val copies = 50L
    val base = concat((0 until 5).map(k =>
      md5(concat(col("g").cast("string"), lit(s"-$k")))): _*)
    val poolTok = md5(pmod(col("doc_id") * 17L, lit(499L)).cast("string"))
    spark.range(nGroups * copies)
      .select(col("id").as("doc_id"), (col("id") / copies).cast("long").as("g"))
      .withColumn("text", concat(base, lit(" ---- "), poolTok))
      .select(col("doc_id"), col("text"))
      .write.mode("overwrite").parquet(path)
  }

  private def shingled(docs: DataFrame): DataFrame =
    docs.filter(length(col("text")) >= 5)
      .select(col("doc_id"), DedupOps.shingles(col("text"), 5).as("sh"))

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir",
        if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft-spark" else
          System.getProperty("java.io.tmpdir"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dirA = "/tmp/crossover/a"; val dirB = "/tmp/crossover/b"
    timed("gen corpus A (100K docs)")(genCorpusA(spark, dirA))
    timed("gen corpus B (12K docs)")(genCorpusB(spark, dirB))

    // ---- corpus A: prefix-filter flip + distributed-CC flip ----
    val docsA = shingled(spark.read.parquet(dirA)).localCheckpoint()
    val invA = docsA.select(col("doc_id"), explode(col("sh")).as("shingle"))
    val vocabA = invA.select("shingle").distinct().count()
    val nA = docsA.count()
    println(s"[xover] corpus A: $nA docs, vocab $vocabA — " +
      s"bitmap gate ${DedupOps.useBitmapStrategy(vocabA, nA)} (expect false → PREFIX-FILTER path)")
    val pairsA = timed("A jaccardNearDupPairs t=0.5 (prefix-filter)") {
      DedupOps.jaccardNearDupPairs(docsA, 0.5)
        .select(col("doc_a"), col("doc_b")).localCheckpoint()
    }
    val nEdges = pairsA.count()
    println(s"[xover] corpus A: $nEdges verified pairs — " +
      s"driver-CC gate ${nEdges <= DedupOps.MaxDriverEdges} (expect false → DISTRIBUTED CC)")
    val vertsA = spark.read.parquet(dirA).select(col("doc_id"))
    val ccDist = timed("A connectedComponents (distributed label propagation)") {
      val cc = DedupOps.connectedComponents(vertsA, pairsA).localCheckpoint()
      cc.count(); cc
    }
    val ccDriver = timed("A connectedComponents (driver union-find, forced)") {
      val cc = DedupOps.connectedComponents(vertsA, pairsA, Long.MaxValue).localCheckpoint()
      cc.count(); cc
    }
    val ccDiff = ccDist.exceptAll(ccDriver).count() + ccDriver.exceptAll(ccDist).count()
    println(s"[xover] A CC cross-check: distributed vs driver diff rows = $ccDiff " +
      (if (ccDiff == 0) "PASS" else "FAIL"))
    val nGroupsA = ccDist.select("group_id").distinct().count()
    println(s"[xover] A groups: $nGroupsA (expect 2000 planted groups)")

    // ---- corpus B: broadcast→shuffle verification flip ----
    val docsB = shingled(spark.read.parquet(dirB)).localCheckpoint()
    val invB = docsB.select(col("doc_id"), explode(col("sh")).as("shingle"))
    val vocabB = invB.select("shingle").distinct().count()
    val nB = docsB.count()
    val widthB = (vocabB.toInt + 63) / 64
    val bmBytes = nB * (widthB + 2) * 8
    println(s"[xover] corpus B: $nB docs, vocab $vocabB (≤64K → BITMAP verify), " +
      s"bitmap table ≈ ${bmBytes / 1024 / 1024} MB — broadcast gate ${bmBytes <= 64L * 1024 * 1024} " +
      "(expect false → SHUFFLE verify)")
    val candB = timed("B minhash LSH candidates") {
      DedupOps.minhashCandidates(docsB).select(col("doc_a"), col("doc_b")).localCheckpoint()
    }
    println(s"[xover] B candidates: ${candB.count()}")
    val verifiedB = timed("B verifyCandidatesExact (bitmap popcount, shuffle-joined)") {
      val v = DedupOps.verifyCandidatesExact(candB, docsB, 0.5)
        .select(col("doc_a"), col("doc_b")).localCheckpoint()
      v.count(); v
    }
    // independent verification of the same candidates via array_intersect
    val refB = timed("B independent array_intersect verification") {
      val a = docsB.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
      val b = docsB.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
      val v = candB.join(a, "doc_a").join(b, "doc_b")
        .withColumn("ni", size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
        .withColumn("j", col("ni").cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) - col("ni")).cast("double"))
        .filter(col("j") >= 0.5)
        .select(col("doc_a"), col("doc_b")).localCheckpoint()
      v.count(); v
    }
    val vDiff = verifiedB.exceptAll(refB).count() + refB.exceptAll(verifiedB).count()
    println(s"[xover] B verify cross-check: shuffle-bitmap vs array_intersect diff rows = $vDiff " +
      (if (vDiff == 0) "PASS" else "FAIL") + s" (${verifiedB.count()} verified pairs)")
    // ---- diameter-halving CC on a shape propagation cannot handle ----
    // a 100K-node chain has diameter 100K: min-label propagation would
    // need 100K rounds (its backstop fires at 50); the star fallback
    // must converge in O(log n) rounds. Expected labels are known in
    // closed form (every node's component min is 0).
    val nChain = 100000L
    val chain = spark.range(nChain - 1)
      .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))
    val starLabels = timed(s"star CC on a ${nChain}-node chain (diameter ${nChain - 1})") {
      val l = DedupOps.starComponents(chain).localCheckpoint()
      l.count(); l
    }
    val starBad = starLabels
      .filter(col("group_id") =!= 0L || col("doc_id") < 0L || col("doc_id") >= nChain)
      .count()
    val starCovered = starLabels.count()
    println(s"[xover] chain star-CC: $starCovered labeled, $starBad wrong " +
      (if (starBad == 0 && starCovered == nChain) "PASS" else "FAIL"))
    spark.stop()
    if (ccDiff != 0 || vDiff != 0 || starBad != 0 || starCovered != nChain) sys.exit(1)
  }
}
