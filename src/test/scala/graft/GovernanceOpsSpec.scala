package graft

import org.apache.spark.sql.functions._
import graft.operators.{GovernanceOps, GraphOps, Layout}

class GovernanceOpsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------- SCD2

  test("scd2: per key, exactly one open (is_current) version — the max") {
    val d = GovernanceOps.scd2Merge(spark, sf)
    val perKey = d.groupBy("client_id").agg(
      sum(when(col("is_current"), 1L).otherwise(0L)).as("n_open"),
      max(col("version")).as("max_v"),
      max(when(col("is_current"), col("version"))).as("open_v"),
      count(lit(1)).as("n_versions"))
    assert(perKey.filter(col("n_open") =!= 1L).count() === 0)
    assert(perKey.filter(col("open_v") =!= col("max_v")).count() === 0)
    // versions are dense 1..n: count == max
    assert(perKey.filter(col("n_versions") =!= col("max_v")).count() === 0)
  }

  test("scd2: intervals tile — valid_to equals the NEXT version's valid_from") {
    val d = GovernanceOps.scd2Merge(spark, sf).cache()
    val nxt = d.select(col("client_id"), (col("version") - 1).as("version"),
      col("valid_from").as("next_from"))
    val joined = d.join(nxt, Seq("client_id", "version"))
    // every closed interval's valid_to is the successor's valid_from...
    assert(joined.filter(col("valid_to") =!= col("next_from")).count() === 0)
    // ...and intervals never invert. Zero-width (valid_to ==
    // valid_from) is legitimate: a same-instant double change (two
    // feed rows at one ts, split by seq) closes the first version at
    // the instant it opened — the fixtures contain exactly one such
    // pair (customer 123, 1995-02-16).
    assert(d.filter(col("valid_to").isNotNull &&
      col("valid_to") < col("valid_from")).count() === 0)
    d.unpersist()
  }

  test("scd2: consecutive versions always change the tracked attribute") {
    val d = GovernanceOps.scd2Merge(spark, sf)
    val nxt = d.select(col("client_id"), (col("version") - 1).as("version"),
      col("tier").as("next_tier"))
    assert(d.join(nxt, Seq("client_id", "version"))
      .filter(col("tier") === col("next_tier")).count() === 0)
  }

  test("cdc upsert snapshot equals the scd2 open version (two plans, one truth)") {
    val current = GovernanceOps.scd2Merge(spark, sf)
      .filter(col("is_current"))
      .select(col("client_id"), col("tier"))
    val snap = GovernanceOps.cdcUpsert(spark, sf)
      .select(col("client_id"), col("tier").as("snap_tier"))
    assert(current.count() === snap.count())
    assert(current.join(snap, "client_id")
      .filter(col("tier") =!= col("snap_tier")).count() === 0)
  }

  test("scd2 property: random tie-dense feeds reproduce the driver replay exactly") {
    // the corpus holds exactly ONE same-instant change pair; random
    // feeds over a tiny ts range force many, covering the zero-width /
    // tie machinery densely. Deterministic seeds (the PropertySpec
    // convention — the scalacheck bridge isn't needed for this shape).
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 6) {
      val rows = (0 until 40).map { i =>
        (rnd.nextInt(3).toLong + 1, // client 1..3
          new java.sql.Timestamp(rnd.nextInt(8) * 86400000L), // 8 possible days
          i.toLong, // unique seq = arrival order
          s"T${rnd.nextInt(3)}") // 3 tiers → runs collapse
      }
      val feed = rows.toDF("client_id", "ts", "seq", "tier")
      val got = GovernanceOps.scd2Over(feed)
        .select(col("client_id"), col("version"), col("tier"),
          col("valid_from"), col("valid_to"), col("is_current"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          r.getTimestamp(3), Option(r.getTimestamp(4)), r.getBoolean(5)))
        .sortBy(x => (x._1, x._2))
      // driver replay: per client, (ts, seq) order, collapse equal runs
      val expect = rows.groupBy(_._1).toSeq.flatMap { case (client, rs) =>
        val ordered = rs.sortBy(r => (r._2.getTime, r._3))
        val changes = ordered.foldLeft(List.empty[(java.sql.Timestamp, String)]) {
          case (acc, (_, ts, _, tier)) =>
            if (acc.headOption.exists(_._2 == tier)) acc else (ts, tier) :: acc
        }.reverse
        changes.zipWithIndex.map { case ((ts, tier), i) =>
          val next = changes.lift(i + 1).map(_._1)
          (client, i + 1L, tier, ts, next, next.isEmpty)
        }
      }.sortBy(x => (x._1, x._2))
      assert(got.toSeq === expect, s"trial $trial")
    }
  }

  test("pit boundary semantics: inclusive instants and zero-width ties, planted") {
    // versions (pre-reduced to one per (client, ts), ties already to
    // the highest version — the pitJoin contract): client 1 changes to
    // B at t=10 via a zero-width same-instant pair, then C at t=20
    def t(d: Long) = new java.sql.Timestamp(d * 86400000L)
    val versions = Seq(
      (1L, t(10), 2L, "B"), // the tie survivor at the t=10 instant
      (1L, t(20), 3L, "C"))
      .toDF("client_id", "ts", "version", "tier")
    val facts = Seq(
      (1L, t(5), 100L, 1),  // pre-history → NULL
      (1L, t(10), 100L, 2), // AT the instant → inclusive, tie survivor B
      (1L, t(15), 100L, 3), // inside [10, 20) → B
      (1L, t(20), 100L, 4), // AT the next boundary → C
      (1L, t(25), 100L, 5)) // open tail → C
      .toDF("client_id", "ts", "l_orderkey", "l_linenumber")
    val got = GovernanceOps.pitOver(versions, facts)
      .select(col("l_linenumber"), col("version_at"), col("tier_at"))
      .collect()
      .map(r => r.getInt(0) -> (Option(r.get(1)), Option(r.getString(2)))).toMap
    assert(got(1) === ((None, None)))
    assert(got(2) === ((Some(2L), Some("B"))))
    assert(got(3) === ((Some(2L), Some("B"))))
    assert(got(4) === ((Some(3L), Some("C"))))
    assert(got(5) === ((Some(3L), Some("C"))))
  }

  test("pit join: every fact gets the as-of version — driver replay over all facts") {
    val versions = GovernanceOps.scd2Merge(spark, sf)
      .select(col("client_id"), col("version"), col("tier"),
        unix_micros(col("valid_from").cast("timestamp")).as("vf"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .groupBy(_._1)
    val got = GovernanceOps.pitJoin(spark, sf)
      .select(col("client_id"),
        unix_micros(col("ship_ts").cast("timestamp")).as("ts"),
        col("version_at"), col("tier_at"))
      .collect()
    assert(got.length === Tables.lineitem(spark, sf).count())
    got.foreach { r =>
      val (client, ts) = (r.getLong(0), r.getLong(1))
      // as-of pick: max (valid_from, version) with valid_from <= ts
      val eligible = versions.getOrElse(client, Array.empty[(Long, Long, String, Long)])
        .filter(_._4 <= ts)
      if (eligible.isEmpty) assert(r.isNullAt(2) && r.isNullAt(3))
      else {
        val expect = eligible.maxBy(v => (v._4, v._2))
        assert(r.getLong(2) === expect._2, s"client $client ts $ts")
        assert(r.getString(3) === expect._3)
      }
    }
  }

  test("pit join plan: every hash exchange keys on client_id — the one-exchange claim") {
    // the as-of union plan may not re-shuffle on anything but the
    // dimension key: versions chain + union window both cluster on
    // client_id (fact resolution broadcasts the order keys at any
    // dimension-table size that fits; the presentation sort is range).
    // A regression to a per-fact range probe or an extra key would
    // surface here as a foreign hash exchange.
    // exchanges are inserted by EnsureRequirements — inspect the
    // executed plan's text (the PlanAuditSpec approach; AQE hides the
    // prepared tree from collect())
    val keys = hashExchangeKeys(GovernanceOps.pitJoin(spark, sf))
    assert(keys.nonEmpty)
    assert(keys.forall(_ == "client_id"),
      s"foreign hash exchange keys: ${keys.distinct.mkString(",")}")
  }

  /** FULL column list of every hash exchange in the executed plan,
    * rendered "a,b" — so a regression to a composite clustering key
    * (e.g. hashpartitioning(client_id, ts)) fails the single-key
    * asserts instead of slipping past a first-column-only capture. */
  private def hashExchangeKeys(df: org.apache.spark.sql.DataFrame): Seq[String] =
    "hashpartitioning\\(([^)]*)\\)".r
      .findAllMatchIn(df.queryExecution.executedPlan.toString)
      .map(_.group(1).split(",").map(_.trim)
        .filter(_.exists(!_.isDigit))            // drop the numPartitions arg
        .map(_.takeWhile(_ != '#')).mkString(","))
      .toSeq

  test("snapshot diff: planted feeds produce every status and only drift") {
    def t(d: Long) = new java.sql.Timestamp(d * 86400000L)
    // replica A state: 1→T1, 2→T1, 3→T1 (client 3's latest is T1: the
    // T2 row at day 1 is superseded at day 2 — the keep-latest core,
    // not raw membership, must drive the compare)
    val a = Seq((1L, t(1), 10L, "T1"), (2L, t(1), 11L, "T1"),
      (3L, t(1), 12L, "T2"), (3L, t(2), 13L, "T1"))
      .toDF("client_id", "ts", "seq", "tier")
    // replica B state: 2→T1 (same), 3→T2 (changed), 4→T1 (added)
    val b = Seq((2L, t(3), 20L, "T1"), (3L, t(3), 21L, "T2"),
      (4L, t(3), 22L, "T1")).toDF("client_id", "ts", "seq", "tier")
    val got = GovernanceOps.snapshotDiffOver(a, b).collect()
      .map(r => (r.getLong(0), r.getString(1),
        Option(r.getString(2)), Option(r.getString(3))))
    assert(got.toSeq === Seq(
      (1L, "removed", Some("T1"), None),
      (3L, "changed", Some("T1"), Some("T2")),
      (4L, "added", None, Some("T1"))))
    // the negative control: identical replicas have NO drift
    assert(GovernanceOps.snapshotDiffOver(a, a).count() === 0)
  }

  test("snapshot diff plan: two client_id exchanges, join reuses the agg partitioning") {
    val keys = hashExchangeKeys(GovernanceOps.snapshotDiff(spark, sf))
    // one exchange per side's keep-latest aggregation and NOTHING else:
    // the full-outer join consumes both sides already hash-partitioned
    // on the join key, so a third exchange here means EnsureRequirements
    // stopped seeing the aggs' partitioning — a plan regression
    assert(keys === Seq("client_id", "client_id"),
      s"hash exchanges: ${keys.mkString(" | ")}")
  }

  test("scd2/funnel plans: every hash exchange keys on the partition key") {
    val scd2 = hashExchangeKeys(GovernanceOps.scd2Merge(spark, sf))
    assert(scd2.nonEmpty && scd2.forall(_ == "client_id"),
      s"scd2: ${scd2.distinct.mkString(",")}")
    val fun = hashExchangeKeys(graft.operators.EventOps.funnelSteps(spark, sf))
    assert(fun.nonEmpty && fun.forall(_ == "user_id"),
      s"funnel: ${fun.distinct.mkString(",")}")
  }

  test("scd2 lifecycle: streamed change-log appends rebuild the batch dimension") {
    val streamed = GovernanceOps.scd2Lifecycle(spark, sf).collect().map(_.toString).sorted
    val batch = GovernanceOps.scd2Merge(spark, sf).collect().map(_.toString).sorted
    assert(streamed.length === batch.length)
    assert(streamed === batch)
  }

  test("upsert merge is an associative fold: per-batch merge ≡ one-shot snapshot") {
    // simulate CDC micro-batches: three arbitrary slices of the feed,
    // folded through the same max_by merge the snapshot maintainer runs
    val feed = Tables.orders(spark, sf).select(
      col("o_custkey").as("client_id"), col("o_orderdate").as("ts"),
      col("o_orderkey").as("seq"), col("o_orderpriority").as("tier"))
    def merge(a: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      a.groupBy(col("client_id"))
        .agg(max_by(struct(col("ts"), col("seq"), col("tier")),
          struct(col("ts"), col("seq"))).as("last"))
        .select(col("client_id"), col("last.ts").as("ts"),
          col("last.seq").as("seq"), col("last.tier").as("tier"))
    var snap = merge(feed.filter(pmod(col("seq"), lit(3)) === 0))
    for (i <- 1 to 2)
      snap = merge(snap.unionByName(feed.filter(pmod(col("seq"), lit(3)) === i)))
    val folded = snap.select(col("client_id"), col("tier"), col("ts").as("updated_at"),
      col("seq").as("last_seq")).collect().map(_.toString).sorted
    val oneShot = GovernanceOps.cdcUpsert(spark, sf).collect().map(_.toString).sorted
    assert(folded === oneShot)
  }

  // --------------------------------------------------------- checksum

  test("checksum is invariant under row order and partitioning (the point)") {
    val base = GovernanceOps.tableChecksum(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).sortBy(_._1)
    // same logical rows, violently different physical layout
    val docs = Tables.documents(spark, sf)
      .repartition(13, col("lang")) // skewed hash layout
      .sortWithinPartitions(col("n_chars").desc)
    val hv = GovernanceOps.rowHash(Seq("doc_id" -> "int", "text" -> "str",
      "lang" -> "str", "source" -> "str", "n_chars" -> "int"))
    val shuffled = docs.select(hv.as("hv"))
      .agg(sum(col("hv").cast("decimal(38,0)")).cast("string")).head.getString(0)
    assert(base.find(_._1 == "documents").get._3 === shuffled)
  }

  test("checksum is sensitive to a single-row, single-column mutation") {
    val cols = Seq("doc_id" -> "int", "text" -> "str", "lang" -> "str",
      "source" -> "str", "n_chars" -> "int")
    val hv = GovernanceOps.rowHash(cols)
    def sumOf(df: org.apache.spark.sql.DataFrame): String =
      df.select(hv.as("hv"))
        .agg(sum(col("hv").cast("decimal(38,0)")).cast("string")).head.getString(0)
    val docs = Tables.documents(spark, sf)
    val mutated = docs.withColumn("n_chars",
      when(col("doc_id") === 1L, col("n_chars") + 1L).otherwise(col("n_chars")))
    assert(sumOf(docs) !== sumOf(mutated))
  }

  test("checksum row counts match the raw tables") {
    val counts = GovernanceOps.tableChecksum(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("documents") === Tables.documents(spark, sf).count())
    assert(counts("orders") === Tables.orders(spark, sf).count())
    assert(counts("lineitem") === Tables.lineitem(spark, sf).count())
  }

  test("null canonicalization: NULL is distinct from any real value") {
    val cols = Seq("a" -> "str", "b" -> "str")
    val hv = GovernanceOps.rowHash(cols)
    val withNull = Seq(("x", Option.empty[String])).toDF("a", "b").select(hv)
    val withEmpty = Seq(("x", Option(""))).toDF("a", "b").select(hv)
    val swapped = Seq((Option.empty[String], "x")).toDF("a", "b")
      .select(GovernanceOps.rowHash(Seq("a" -> "str", "b" -> "str")))
    assert(withNull.head.getLong(0) !== withEmpty.head.getLong(0))
    assert(withNull.head.getLong(0) !== swapped.head.getLong(0))
    // a literal "N" value must not alias a NULL either
    val litN = Seq(("x", Option("N"))).toDF("a", "b").select(hv)
    assert(withNull.head.getLong(0) !== litN.head.getLong(0))
  }

  test("length-prefixing: a separator inside a value cannot shift field boundaries") {
    // the corruption class a migration checksum exists to catch: content
    // migrating across a column boundary. ("a|b","c") and ("a","b|c")
    // concat_ws-alias to the same joined string; the V<len>: prefixes
    // keep them distinct. Same for values containing the prefix syntax.
    val cols = Seq("a" -> "str", "b" -> "str")
    val hv = GovernanceOps.rowHash(cols)
    def h(a: String, b: String): Long =
      Seq((a, b)).toDF("a", "b").select(hv).head.getLong(0)
    assert(h("a|b", "c") !== h("a", "b|c"))
    assert(h("V1:x", "y") !== h("x", "y"))
    assert(h("", "ab") !== h("ab", ""))
  }

  // --------------------------------------------------------- anomaly

  test("anomaly MAD: stats match an independent driver-side recomputation") {
    val out = GovernanceOps.anomalyMad(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val cents = Tables.events(spark, sf)
      .filter(col("event_type") === "click")
      .select(floor(col("value") * 100).cast("long")).collect().map(_.getLong(0)).sorted
    def q50(xs: Array[Double]): Double = {
      val pos = 0.5 * (xs.length - 1); val lo = pos.toInt
      if (lo + 1 < xs.length) xs(lo) + (xs(lo + 1) - xs(lo)) * (pos - lo) else xs(lo)
    }
    val med = q50(cents.map(_.toDouble))
    val dev = cents.map(c => math.abs(c - med)).sorted
    val mad = q50(dev)
    val row = out("click")
    assert(row.getLong(1) === cents.length)
    assert(row.getDouble(2) === med)
    assert(row.getDouble(3) === mad)
    assert(row.getLong(4) === dev.count(_ > 5 * mad))
  }

  test("anomaly MAD: exact cents space — medians land on binary fractions") {
    // med is a half-integer, MAD a quarter-integer: times 4 is integral,
    // which is what makes every fence comparison ulp-safe cross-engine
    val out = GovernanceOps.anomalyMad(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert((r.getDouble(2) * 2) === (r.getDouble(2) * 2).toLong.toDouble)
      assert((r.getDouble(3) * 4) === (r.getDouble(3) * 4).toLong.toDouble)
    }
  }

  // ---------------------------------------------------------- profile

  test("profile: documents key column is non-null and unique") {
    val p = GovernanceOps.profileStats(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val n = Tables.documents(spark, sf).count()
    val id = p("doc_id")
    assert(id.getLong(1) === 0L)      // n_nulls
    assert(id.getLong(2) === n)       // n_distinct == n_rows: unique key
    assert(id.getLong(5) === n)       // n_rows
    assert(p.size === 5)
    // min/max render the native ordering, not the string ordering
    assert(id.getString(3).toLong <= id.getString(4).toLong)
  }

  test("profile: null counting and distinct-ignores-null on a planted frame") {
    val d = Seq(
      (Option("x"), Option(1L)), (Option("x"), None),
      (Option.empty[String], Option(2L)), (Option("y"), None))
      .toDF("s", "n")
    val p = GovernanceOps.profileOver(d, Seq("s", "n")).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p("s").getLong(1) === 1L) // one NULL string
    assert(p("s").getLong(2) === 2L) // distinct ignores the NULL: x, y
    assert(p("n").getLong(1) === 2L)
    assert(p("n").getLong(2) === 2L)
    assert(p("n").getString(3) === "1" && p("n").getString(4) === "2")
    assert(p("s").getLong(5) === 4L) // n_rows counts every row
  }

  // ------------------------------------------------- random projection

  test("random projection matches a third, MessageDigest-based implementation") {
    // Spark folds md5('i|j') via Catalyst; DuckDB evaluates its own md5;
    // this recomputes the signs with java.security.MessageDigest and the
    // sums with plain Scala — three independent md5/arithmetic stacks
    // must agree exactly.
    def sign(i: Int, j: Int): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$i|$j".getBytes("UTF-8"))
      val hex = "%02x".format(d(0)) // first hex char = high nibble of byte 0
      if (hex.charAt(0).toInt % 2 == 0) 1L else -1L
    }
    val expect = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map { r =>
        val emb = r.getSeq[Float](1)
        val projected = (0 until graft.operators.SimilarityOps.ProjDims).map { j =>
          (1 to 64).map(i =>
            math.floor(emb(i - 1).toDouble * 1000000L).toLong * sign(i, j)).sum
        }
        r.getLong(0) -> projected
      }.toMap
    val got = graft.operators.SimilarityOps.randomProjection(spark, sf)
      .collect().map(r => r.getLong(0) ->
        (1 to graft.operators.SimilarityOps.ProjDims).map(r.getLong)).toMap
    assert(got === expect)
  }

  // --------------------------------------------------------- pagerank

  test("pagerank: hub of a star outranks its spokes; spokes are symmetric") {
    // star: hub 0 — spokes 1..8
    val pairs = (1L to 8L).map(i => (0L, i)).toDF("doc_a", "doc_b")
    val r = GraphOps.pagerankOver(pairs).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    val spokes = (1L to 8L).map(r)
    assert(spokes.distinct.size === 1) // symmetry: identical by exact arithmetic
    assert(r(0L) > spokes.head * 3)    // centrality signal is strong
  }

  test("pagerank: disconnected symmetric components rank identically") {
    // two triangles: every node has degree 2 and identical neighborhoods
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (11L, 12L), (12L, 13L), (11L, 13L))
      .toDF("doc_a", "doc_b")
    val ranks = GraphOps.pagerankOver(pairs).collect().map(_.getLong(1))
    assert(ranks.distinct.length === 1)
    // regular graph fixpoint: rank stays at the unit (minus truncation)
    assert(math.abs(ranks.head - GraphOps.RankUnit) <= 10)
  }

  test("pagerank: total rank is conserved up to truncation loss") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (2L, 5L))
      .toDF("doc_a", "doc_b")
    val r = GraphOps.pagerankOver(pairs).collect().map(_.getLong(1))
    val total = r.sum
    val n = r.length
    // each of the 10 rounds loses < (deg sum + n) units to truncation
    assert(total <= n * GraphOps.RankUnit)
    assert(total > n * GraphOps.RankUnit - 10 * (2 * 5 + n + 100))
    // nobody falls below the damping floor
    assert(r.forall(_ >= GraphOps.DampingFloor))
  }

  test("pagerank tiers: distributed rounds ≡ driver loop on a random graph") {
    // deterministic pseudo-random graph: 60 nodes, ~150 edges
    val rnd = new scala.util.Random(42)
    val pairs = (1 to 150).map { _ =>
      val a = rnd.nextInt(60).toLong; val b = rnd.nextInt(60).toLong
      (math.min(a, b), math.max(a, b) + 1)
    }.distinct.toDF("doc_a", "doc_b")
    val driver = GraphOps.pagerankOver(pairs, Long.MaxValue).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = GraphOps.pagerankOver(pairs, 0L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(driver === dist) // exact integer arithmetic: IDENTICAL, not close
  }

  test("pagerank over the corpus graph: endpoints only, floor respected") {
    val r = GraphOps.pagerank(spark, sf).cache()
    val endpoints = graft.operators.DedupOps
      .jaccardPairsIndexed(spark, sf, 0.5)
      .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
      .distinct().count()
    assert(r.count() === endpoints)
    assert(r.filter(col("rank_micro") < GraphOps.DampingFloor).count() === 0)
    r.unpersist()
  }

  test("upsertLifecycle: bootstrapped evens + stateful-streamed odds serve " +
    "the batch cdcUpsert exactly; state suppresses non-improvements") {
    try {
      val got = GovernanceOps.upsertLifecycle(spark, sf).collect().toSeq
      val expected = GovernanceOps.cdcUpsert(spark, sf).collect().toSeq
      assert(got === expected)
      // the accumulated epoch holds one bootstrap row per even client
      // and only the IMPROVING emissions per odd client — strictly
      // fewer rows than the odd half of the feed (the state did work)
      val base = GovernanceOps.upsertLifecycleBase(sf)
      val acc = spark.table(
        graft.operators.Layout.currentEpochTable(spark, base).get)
      val feed = Tables.orders(spark, sf)
      val oddFeedRows = feed.filter(col("o_custkey") % 2 =!= 0).count()
      val accOdd = acc.filter(col("client_id") % 2 =!= 0).count()
      assert(accOdd < oddFeedRows,
        "streamed state emitted every row — keep-latest suppressed nothing")
      val evenClients = feed.filter(col("o_custkey") % 2 === 0)
        .select(col("o_custkey")).distinct().count()
      assert(acc.filter(col("client_id") % 2 === 0).count() === evenClients)
    } finally {
      graft.operators.Layout.dropEpochFamily(spark,
        GovernanceOps.upsertLifecycleBase(sf))
    }
  }

  // ------------------------------------------------------ FK inference

  test("fkInference: the seven true FKs are inferred from data, the control is not") {
    val rows = GovernanceOps.fkInference(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(6), r.getBoolean(7))).toMap
    assert(rows.size === 8)
    val control = rows(("orders.o_orderkey", "customer.c_custkey"))
    assert(!control._4, "the negative control must not be inferred")
    assert(control._3 < 1.0, "control containment must fail on the data")
    rows.filterNot(_._1 == ("orders.o_orderkey", "customer.c_custkey"))
      .foreach { case (pair, (nc, cont, containment, inferred)) =>
        assert(inferred, s"$pair should be inferred")
        assert(containment === 1.0 && cont === nc, s"$pair containment")
      }
  }

  test("rfmSegments: scores bounded, cells partition the customer base, " +
    "quartile scoring replays on the driver") {
    val d = GovernanceOps.rfmSegments(spark, sf).collect()
    val nCust = Tables.orders(spark, sf)
      .select(col("o_custkey")).distinct().count()
    assert(d.map(_.getLong(4)).sum === nCust)
    d.foreach { r =>
      (0 to 2).foreach(i => assert(r.getLong(i) >= 1 && r.getLong(i) <= 4))
      assert(Set("champion", "loyal", "recent", "at_risk_valuable",
        "hibernating")(r.getString(3)))
    }
    // driver replay of the full scoring pipeline
    val rows = Tables.orders(spark, sf)
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("d"),
        floor(col("o_totalprice") * 100).cast("long").as("c"))
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate, r.getLong(2)))
    val anchor = rows.map(_._2).max
    val per = rows.groupBy(_._1).map { case (_, os) =>
      (java.time.temporal.ChronoUnit.DAYS.between(os.map(_._2).max, anchor),
        os.length.toLong, os.map(_._3).sum)
    }.toSeq
    def q(vs: Seq[Long], p: Double): Double = {
      val s = vs.sorted; val h = (s.length - 1) * p
      val lo = h.toInt; val frac = h - lo
      if (lo + 1 < s.length) s(lo) + (s(lo + 1) - s(lo)) * frac else s(lo).toDouble
    }
    def scoreUp(v: Long, vs: Seq[Long]) =
      1L + Seq(0.25, 0.5, 0.75).count(p => v > q(vs, p))
    def scoreDown(v: Long, vs: Seq[Long]) =
      1L + Seq(0.25, 0.5, 0.75).count(p => v < q(vs, p))
    val (rs, fs, ms) = (per.map(_._1), per.map(_._2), per.map(_._3))
    val cells = per.groupBy { case (r, f, m) =>
      (scoreDown(r, rs), scoreUp(f, fs), scoreUp(m, ms))
    }.map { case (k, v) => (k, v.size.toLong) }
    assert(d.map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)), r.getLong(4))).toMap
      === cells)
  }

  test("dqChecks: clean fixtures pass all six; planted violations flip each row") {
    val clean = GovernanceOps.dqChecks(spark, sf).collect()
    assert(clean.length === 6)
    clean.foreach { r =>
      assert(r.getLong(1) === 0L, s"${r.getString(0)} violated on clean fixtures")
      assert(r.getBoolean(2))
    }
    // planted frame: one violation per check
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-dq").toString
    val ts = java.sql.Timestamp.valueOf(_: String)
    Seq(
      (Option(1L), 10L, "O", 5.0, ts("1995-06-01 00:00:00"), "1-URGENT"),
      (Option(2L), 10L, "O", 5.0, ts("1995-06-01 00:00:00"), "1-URGENT"),
      (Option(2L), 10L, "O", 5.0, ts("1995-06-01 00:00:00"), "1-URGENT"), // dup key
      (Option(3L), 10L, "O", -1.0, ts("1995-06-01 00:00:00"), "1-URGENT"), // negative
      (Option(4L), 10L, "X", 5.0, ts("1995-06-01 00:00:00"), "1-URGENT"), // bad status
      (Option(5L), 10L, "O", 5.0, ts("1980-01-01 00:00:00"), "1-URGENT"), // out of range
      (Option(6L), 99L, "O", 5.0, ts("1995-06-01 00:00:00"), "1-URGENT"), // orphan FK
      (Option.empty[Long], 10L, "O", 5.0, ts("1995-06-01 00:00:00"), "1-URGENT")) // null key
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((10L, "c", 1, 0.0, "BUILDING"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val planted = GovernanceOps.dqChecks(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(planted("orderkey_not_null") === ((1L, false)))
    assert(planted("orderkey_unique") === ((1L, false))) // one duplicated key
    assert(planted("totalprice_nonnegative") === ((1L, false)))
    assert(planted("orderdate_in_range") === ((1L, false)))
    assert(planted("status_in_domain") === ((1L, false)))
    assert(planted("custkey_fk_valid") === ((1L, false)))
  }

  test("shardAssignment: shards partition the corpus, load ratios reconcile") {
    val d = GovernanceOps.shardAssignment(spark, sf).collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(d.map(_.getLong(1)).sum === nDocs)
    assert(d.map(_.getLong(0)).forall(s => s >= 0 && s < 32))
    d.foreach(r => assert(r.getDouble(3) ===
      r.getLong(1).toDouble * 32 / nDocs))
    // md5 is uniform: no shard should carry a pathological multiple
    assert(d.map(_.getDouble(3)).max < 4.0)
  }

  test("triangleStats: census replays against a driver graph walk") {
    val r = GraphOps.triangleStats(spark, sf).head()
    val edges = graft.operators.DedupOps.jaccardPairsIndexed(spark, sf, 0.5)
      .select(col("doc_a"), col("doc_b")).collect()
      .map(e => (e.getLong(0), e.getLong(1))).toSet
    val nodes = edges.flatMap(e => Seq(e._1, e._2))
    val deg = nodes.map(v => v ->
      edges.count(e => e._1 == v || e._2 == v)).toMap
    val wedges = deg.values.map(d => d.toLong * (d - 1) / 2).sum
    val tris = (for {
      (a, b) <- edges; (b2, c) <- edges if b2 == b
      if edges.contains((a, c))
    } yield (a, b, c)).size.toLong
    assert(r.getLong(0) === nodes.size.toLong)
    assert(r.getLong(1) === edges.size.toLong)
    assert(r.getLong(2) === wedges)
    assert(r.getLong(3) === tris)
    if (wedges > 0) assert(r.getDouble(4) === tris * 3.0 / wedges)
  }

  // ------------------------------------------------------------ Z-order

  test("zorderLayout: 64 ntile-even files; Z extents prune where date-linear cannot") {
    val files = GovernanceOps.zorderLayout(spark, sf).collect()
    assert(files.map(_.getLong(0)).toSeq === (1L to 64L))
    val orders = Tables.orders(spark, sf)
    val n = orders.count()
    val sizes = files.map(_.getLong(1))
    assert(sizes.sum === n)
    assert(sizes.max - sizes.min <= 1, "ntile files differ by at most one row")
    for (r <- files) {
      assert(r.getLong(2) >= 0 && r.getLong(3) <= 255)
      assert(r.getLong(4) >= 0 && r.getLong(5) <= 255)
    }
    // The point of Z-order: a one-custkey-bucket predicate overlaps few
    // Z files. The date-linear layout (files cut by orderdate order)
    // spans the full custkey range in EVERY file, pruning nothing.
    def overlaps(xMin: Long, xMax: Long, x: Long) = xMin <= x && x <= xMax
    val probe = 128L // mid-range custkey bucket (edge buckets are noisy
    // at sf0.001's ~23 rows/file: a file's random min may sit above a
    // low probe, making even the linear layout look like it prunes)
    val zHit = files.count(r => overlaps(r.getLong(2), r.getLong(3), probe))
    import org.apache.spark.sql.expressions.Window
    val b = orders.agg(min(col("o_custkey")), max(col("o_custkey"))).head()
    val (kMin, kMax) = (b.getLong(0), b.getLong(1))
    val linear = orders
      .withColumn("x", expr(s"((o_custkey - $kMin) * 256) div ${kMax - kMin + 1}"))
      .withColumn("f", ntile(64).over(Window.orderBy(col("o_orderdate"), col("o_orderkey"))))
      .groupBy("f").agg(min("x").as("x_min"), max("x").as("x_max"))
      .collect()
    val linHit = linear.count(r => overlaps(r.getLong(1), r.getLong(2), probe))
    assert(linHit >= 48,
      s"date-linear files should span the mid custkey bucket almost everywhere ($linHit/64)")
    assert(zHit * 4 <= linHit,
      s"Z-order must prune at least 4x better than linear ($zHit vs $linHit)")
  }

  test("compactionBins: next-fit-on-sorted packing matches a driver replay, " +
      "incl. a bigger-than-target file and an exact boundary hit") {
    val s = spark; import s.implicits._
    val target = 1000L
    // crafted inventory: one file OVER target (2500), one exactly at a
    // boundary landing (cum_before = 3000 → bin 3), mixed small tails;
    // sizes straddle several bit-length classes so the class-prefix
    // decomposition is exercised, not bypassed
    val inv = Seq(
      ("a", "2024-01-01", 2500L), ("b", "2024-01-01", 500L),
      ("c", "2024-01-01", 400L), ("d", "2024-01-01", 300L),
      ("e", "2024-01-01", 300L), ("f", "2024-01-01", 120L),
      ("g", "2024-01-01", 60L), ("h", "2024-01-01", 60L),
      ("i", "2024-01-01", 7L)
    ).toDF("event_type", "day_s", "bytes")
      .select(col("event_type"), to_date(col("day_s")).as("day"), col("bytes"))
    val got = GovernanceOps.compactionBins(inv, target).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    // driver replay of the rule: sort bytes desc (keys tie-break),
    // exclusive running sum, bin = cum div target
    val sorted = Seq(("a", 2500L), ("b", 500L), ("c", 400L), ("d", 300L),
      ("e", 300L), ("f", 120L), ("g", 60L), ("h", 60L), ("i", 7L))
    val cums = sorted.map(_._2).scanLeft(0L)(_ + _).init
    val expect = sorted.zip(cums).map { case ((k, b), c) => (k, b, c, c / target) }
    assert(got.toSeq === expect)
    // structural guarantees
    val total = sorted.map(_._2).sum
    val nBins = got.map(_._4).distinct.length
    assert(nBins <= ((total + target - 1) / target).toInt)
    val maxFile = sorted.map(_._2).max
    for ((_, rows) <- got.groupBy(_._4))
      assert(rows.map(_._2).sum < target + maxFile)
    // files within a bin are contiguous in packing order (next-fit)
    val binSeq = got.map(_._4).toSeq
    assert(binSeq === binSeq.sorted)
  }

  test("kcore: pendant chain peels over many rounds, clique survives with " +
      "exact core degrees; over-cap chain fails fast") {
    val s = spark; import s.implicits._
    // 4-clique {1,2,3,4} + a 9-node pendant chain off node 4 + an
    // isolated pair {100,101}: the chain needs 9 peel rounds (one
    // endpoint per round) — inside the 12-round cap — and the pair and
    // the whole chain must vanish, leaving the clique at core_deg 3
    val clique = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val chain = (0 until 9).map(i => (if (i == 0) 4L else 10L + i - 1, 10L + i))
    val pairs = (clique ++ chain ++ Seq((100L, 101L))).toDF("doc_a", "doc_b")
    val got = GraphOps.kcoreOver(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // a chain longer than the round cap must fail fast (the oracle
    // unrolls exactly KCoreRounds levels — silence would be a hash
    // mismatch in the driver gate instead of an actionable error)
    val longChain = (0 until 14).map(i => (if (i == 0) 4L else 200L + i - 1, 200L + i))
    val tooDeep = (clique ++ longChain).toDF("doc_a", "doc_b")
    val e = intercept[IllegalArgumentException] {
      GraphOps.kcoreOver(tooDeep).collect()
    }
    assert(e.getMessage.contains("did not converge"))
    // corpus sanity: every survivor keeps >= k alive neighbors
    val corpus = GraphOps.kcore(spark, sf).collect()
    assert(corpus.forall(_.getLong(1) >= GraphOps.KCoreK))
  }

  test("equidepthHistogram: boundaries and counts match a BigInt driver " +
      "recompute of the type-7 quantiles; depth sums to N") {
    val got = GovernanceOps.equidepthHistogram(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length === 16)
    // driver recompute: sorted cents, boundary_16ths[k] at rank (N-1)k/16
    val cents = Tables.orders(spark, sf)
      .select(round(col("o_totalprice") * 100).cast("long").as("c"))
      .collect().map(_.getLong(0)).sorted
    val n = cents.length
    val b16 = (0 to 16).map { k =>
      val num = (n - 1).toLong * k        // rank in 16ths = num/16
      val (lo, m) = (num / 16, num % 16)
      val hi = math.min(lo + 1, n - 1)
      cents(lo.toInt) * (16 - m) + cents(hi.toInt) * m
    }
    for (((bk, lo, hi, cnt), k) <- got.zipWithIndex) {
      assert(bk === k + 1L)
      assert(lo === b16(k), s"lo boundary $k")
      assert(hi === b16(k + 1), s"hi boundary $k")
      assert(lo <= hi)
      // driver count replay of the (lo, hi] / first-bucket-inclusive rule
      val want = cents.count { c =>
        val c16 = c * 16
        val bucket = (1 to 15).find(j => c16 <= b16(j)).getOrElse(16)
        bucket == k + 1
      }
      assert(cnt === want.toLong, s"bucket ${k + 1} count")
    }
    assert(got.map(_._4).sum === n.toLong)
  }

  test("compactionPlan on the corpus: guarantees hold at the gated target") {
    val got = GovernanceOps.compactionPlan(spark, sf).collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.nonEmpty)
    val target = 262144L
    val total = got.map(_._1).sum
    val nBins = got.map(_._3).distinct.length
    assert(nBins <= ((total + target - 1) / target).toInt)
    val maxFile = got.map(_._1).max
    for ((_, rows) <- got.groupBy(_._3))
      assert(rows.map(_._1).sum < target + maxFile)
  }

  // ------------------------------------------- zone-map file skipping

  test("zAssign: exact NTILE(64) semantics on a random fixture — file sizes and Z-ordering replay on the driver; empty input yields no files") {
    val rnd = new scala.util.Random(42)
    val n = 1000
    import spark.implicits._
    val rows = (0 until n).map { i =>
      (i.toLong, rnd.nextInt(5000).toLong, java.sql.Date.valueOf(
        java.time.LocalDate.of(2020, 1, 1).plusDays(rnd.nextInt(1000).toLong)))
    }.toDF("o_orderkey", "k", "d")
    val a = GovernanceOps.zAssign(rows).collect()
    assert(a.length === n)
    // ntile sizes: the first n%64 files carry one extra row
    val bySize = a.groupBy(_.getAs[Long]("file_id")).view.mapValues(_.length).toMap
    val (size, rem) = (n / 64, n % 64)
    for (f <- 1L to 64L)
      assert(bySize(f) === (if (f <= rem) size + 1 else size), s"file $f size")
    // file boundaries respect the (z, o_orderkey) total order — recompute
    // the interleave on the driver, independently of the Column expression
    def zOf(r: org.apache.spark.sql.Row): Long = {
      val x = r.getAs[Long]("x"); val y = r.getAs[Long]("y")
      (0 until 8).map(i =>
        (((x >> i) & 1L) << (2 * i + 1)) + (((y >> i) & 1L) << (2 * i))).sum
    }
    val fileSeq = a.sortBy(r => (zOf(r), r.getAs[Long]("o_orderkey")))
      .map(_.getAs[Long]("file_id")).toSeq
    assert(fileSeq === fileSeq.sorted,
      "file ids must be non-decreasing along the (z, key) order")
    // empty input: no anchors, no files, schema intact
    val empty = GovernanceOps.zAssign(rows.filter(lit(false)))
    assert(empty.collect().isEmpty)
    assert(empty.columns.contains("file_id"))
  }

  test("zonemap: pruned scan ≡ full-table filter (rule-off control), and pruning is real") {
    val t = GovernanceOps.ensureZonemapIndex(spark, sf)
    val (served, scanned, total, box) = GovernanceOps.zonemapServe(spark, t)
    // the sidecar-derived box IS the base-table-derived box: zone maps
    // ledger actual row extents, so their global min/max is the corpus'
    assert(box === GovernanceOps.zonemapBox(spark, sf))
    val (kLo, kHi, dLo, dHi) = box
    val full = GovernanceOps.ordersKd(spark, sf)
      .filter(col("k").between(kLo, kHi) &&
        col("d").between(lit(dLo), lit(dHi)))
      .groupBy(col("prio"))
      .agg(count(lit(1)).as("n_rows"), sum(col("cents")).as("cents"))
    assert(served.orderBy("prio").collect().toSeq ===
      full.orderBy("prio").collect().toSeq)
    assert(scanned > 0 && scanned < total)
    // the 2-D box pins the top four interleaved bits → ~1/16 of the Z
    // range; even with boundary files the pruner must beat 1/4
    assert(scanned.toDouble / total < 0.25)
  }

  test("zonemap: skipping is conservative and exact — pruned-away files hold zero matching rows; the scan's row universe is exactly the surviving files") {
    val t = GovernanceOps.ensureZonemapIndex(spark, sf)
    val (kLo, kHi, dLo, dHi) = GovernanceOps.zonemapBox(spark, sf)
    val zmap = spark.table(t + GovernanceOps.ZmapSuffix)
    val hits = zmap
      .filter(col("k_max") >= kLo && col("k_min") <= kHi &&
        col("d_max") >= lit(dLo) && col("d_min") <= lit(dHi))
    val hitIds = hits.select("file_id").collect().map(_.getLong(0)).toSeq
    val inBox = col("k").between(kLo, kHi) &&
      col("d").between(lit(dLo), lit(dHi))
    // conservative: no matching row lives in a pruned file
    assert(spark.table(t)
      .filter(!col("file_id").isin(hitIds: _*) && inBox).count() === 0L)
    // exact: the pruned scan reads precisely the surviving files' rows
    assert(spark.table(t).filter(col("file_id").isin(hitIds: _*)).count() ===
      hits.agg(sum("n_rows")).head().getLong(0))
  }

  test("zonemap: the file_id restriction reaches the scan as a RUNTIME " +
      "partition filter (DPP), not a driver literal — pruned files are " +
      "never listed and the plan is O(1)-sized at any inventory") {
    val t = GovernanceOps.ensureZonemapIndex(spark, sf)
    val (served, scanned, total, _) = GovernanceOps.zonemapServe(spark, t)
    served.collect() // finalize the adaptive plan before inspecting it
    def finalPlan(p: org.apache.spark.sql.execution.SparkPlan)
        : org.apache.spark.sql.execution.SparkPlan = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case other => other
    }
    val plan = finalPlan(served.queryExecution.executedPlan).toString
    assert(plan.matches("(?s).*PartitionFilters: \\[[^\\]]*file_id[^\\]]*\\].*"),
      s"no partition filter on file_id in:\n$plan")
    // the r14 scale-killer retired: the skip decision reaches the scan
    // as dynamicpruningexpression(file_id IN subquery) — a runtime
    // filter fed by the broadcast sidecar join, NOT an IN-list literal
    // whose plan size grows with the file count
    assert(plan.contains("dynamicpruning"),
      s"expected a dynamic partition pruning expression in:\n$plan")
    assert(!plan.matches("(?s).*file_id[^\\n]*IN \\(1,2,3.*"),
      s"driver-built literal IN-list found in:\n$plan")
    // and the runtime skip actually happened: the fact scan listed
    // exactly the surviving partitions, not the whole inventory
    // (AQE query stages are leaf nodes — descend into them explicitly)
    def allScans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        allScans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        allScans(q.plan)
      case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
      case other => other.children.flatMap(allScans)
    }
    val fact = allScans(served.queryExecution.executedPlan)
      .filter(_.tableIdentifier.exists(_.table == t))
    assert(fact.nonEmpty, s"fact scan not found in:\n$plan")
    fact.foreach { s =>
      val read = s.metrics.get("numPartitions").map(_.value)
      assert(read.contains(scanned),
        s"DPP must list exactly the $scanned surviving partitions " +
          s"(of $total), got $read")
    }
  }

  test("zonemap optimize: ingest degrades skipping, OPTIMIZE restores the one-shot clustered state exactly") {
    val out = GovernanceOps.zonemapOptimize(spark, sf).collect()
    val quarter = GovernanceOps.ordersKd(spark, sf)
      .filter(col("o_orderkey") % 4 === 0) // the key's sub-corpus
    // the optimized state is bit-identical (file assignment included)
    // to a one-shot clustered build of the same corpus
    val oneShotName = "graft_zmopt_oneshot_spec"
    try {
      GovernanceOps.buildZonemapEpoch(spark, oneShotName, quarter)
      val base = GovernanceOps.zonemapOptimizeBase(sf)
      val cur = graft.operators.Layout.currentEpoch(spark, base).get
      val t = graft.operators.Layout.epochTable(base, cur)
      val a = spark.table(t)
      val b = spark.table(oneShotName)
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        "OPTIMIZE must converge to the one-shot layout, file_id included")
      // the degraded (pre-OPTIMIZE) epoch is still retained: it must have
      // scanned strictly more files — the two ingest appends span the box
      val degraded = graft.operators.Layout.epochTable(base, cur - 1)
      val (_, scannedDeg, totalDeg, boxDeg) =
        GovernanceOps.zonemapServe(spark, degraded)
      val scannedOpt = out.head.getLong(3)
      assert(totalDeg === 66L) // 64 clustered + 2 ingest files
      // the degradation: batch-grain ingest files carry full-span
      // extents, so the pruner must scan BOTH for any box — re-cluster
      // is the only way to win that skipping back
      val (bk1, bk2, bd1, bd2) = boxDeg
      val survivors = spark.table(degraded + GovernanceOps.ZmapSuffix)
        .filter(GovernanceOps.zmapOverlaps(bk1, bk2, bd1, bd2))
        .select("file_id").collect().map(_.getLong(0)).toSet
      assert(Set(1000L, 1001L).subsetOf(survivors),
        s"both ingest files must defeat pruning, survivors=$survivors")
      assert(scannedDeg >= scannedOpt)
      assert(scannedOpt < 64L, "post-OPTIMIZE pruning must be real")
      assert(out.head.getLong(4) === 64L)
      // no rows lost across ingest + OPTIMIZE
      assert(spark.table(t).count() === quarter.count())
    } finally {
      Seq("", GovernanceOps.ZmapSuffix).foreach(s =>
        spark.sql(s"DROP TABLE IF EXISTS $oneShotName$s"))
    }
  }

  test("dppPrune: the dim filter reaches the fact scan as a runtime DPP " +
      "subquery; the scan lists exactly the qualifying months") {
    val out = GovernanceOps.dppPrune(spark, sf)
    val got = out.collect()
    assert(got.nonEmpty)
    val (scanned, total) = (got.head.getLong(3), got.head.getLong(4))
    assert(scanned > 0 && scanned < total, s"prune must be real: $scanned/$total")
    def allScans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        allScans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        allScans(q.plan)
      case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
      case other => other.children.flatMap(allScans)
    }
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected a runtime DPP subquery on the fact scan in:\n$plan")
    // the fact-side scan (the one carrying the DPP partition filter)
    // listed exactly the qualifying months; the dim-side scan of the
    // same table reads all partitions — that is the dim build cost
    val dppScans = allScans(out.queryExecution.executedPlan).filter(
      _.toString.contains("dynamicpruning"))
    assert(dppScans.nonEmpty, s"no scan carries the DPP filter in:\n$plan")
    dppScans.foreach { s =>
      val read = s.metrics.get("numPartitions").map(_.value)
      assert(read.contains(scanned),
        s"DPP fact scan must list exactly $scanned months, got $read")
    }
    // result sanity: the joined aggregate only covers qualifying months
    val t = GovernanceOps.ensureDppIndex(spark, sf)
    val fact = spark.table(t)
    val keep = fact.groupBy(col("m")).agg(sum(col("cents")).as("tot"))
      .filter(pmod(col("tot"), lit(3L)) === 0L)
    assert(got.map(_.getLong(1)).sum ===
      fact.join(keep.select("m"), Seq("m")).count())
  }

  test("mergeOnRead: DELETE/MERGE are metadata-plus-one-file; the MOR view " +
      "applies both before OPTIMIZE; OPTIMIZE folds tombstones to empty") {
    val out = GovernanceOps.mergeOnRead(spark, sf).collect()
    assert(out.nonEmpty)
    // convergence + fold facts carried by the gated row itself
    assert(out.forall(_.getBoolean(5)), "mor_converged must hold")
    assert(out.forall(_.getLong(6) === 0L), "dv must be empty after OPTIMIZE")
    // the retained pre-OPTIMIZE epoch still carries the merge-on-read
    // state: tombstones + the one ingest file, data files NOT rewritten
    val base = GovernanceOps.morBase(sf)
    val cur = Layout.currentEpoch(spark, base).get
    val t0 = Layout.epochTable(base, cur - 1)
    val o = GovernanceOps.ordersKd(spark, sf)
      .filter(col("o_orderkey") % 4 === 0) // the key's sub-corpus
    val nDel = o.filter(col("o_orderkey") % 7 === 3).count()
    val nUpd = o.filter(col("o_orderkey") % 7 === 5).count()
    assert(spark.table(t0 + GovernanceOps.DvSuffix).count() === nDel + nUpd)
    // 64 bulk files + exactly one ingest file for the merged versions
    assert(spark.table(t0).select("file_id").distinct().count() === 65L)
    // the MOR read of the degraded epoch: deleted keys gone, merged keys
    // served from the NEW version only (old version voided by sequence)
    val mor = GovernanceOps.morRead(spark, t0)
    assert(mor.filter(col("o_orderkey") % 7 === 3).count() === 0L)
    val merged = mor.filter(col("o_orderkey") % 7 === 5)
    assert(merged.count() === nUpd, "exactly one surviving version per merged key")
    assert(merged.filter(col("file_id") <= 64L).count() === 0L,
      "surviving merged versions must come from the ingest file")
    // count parity: all − deleted (merge replaces, never duplicates)
    assert(mor.count() === o.count() - nDel)
  }

  test("mergeOnRead lifecycle: streamed tombstones accumulate batch-local; " +
      "final MOR scan equals the predicate oracle") {
    val out = GovernanceOps.mergeOnReadLifecycle(spark, sf).collect()
    assert(out.forall(_.getBoolean(3)), "did_tombstone must hold")
    val o = GovernanceOps.ordersKd(spark, sf)
      .filter(col("o_orderkey") % 4 === 0) // the key's sub-corpus
    val expect = o.filter(col("o_orderkey") % 7 =!= 3)
      .groupBy(col("prio"))
      .agg(count(lit(1)).as("n_rows"), sum(col("cents")).as("cents"))
      .orderBy("prio").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ===
      expect.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq)
    // the sidecar holds every streamed delete, no data file rewritten
    val t = Layout.currentEpochTable(spark,
      GovernanceOps.morLifecycleBase(sf)).get
    assert(spark.table(t + GovernanceOps.DvSuffix).count() ===
      o.filter(col("o_orderkey") % 7 === 3).count())
    assert(spark.table(t).count() === o.count(), "data files untouched")
  }

  test("timeTravel: both versions readable as-of, rollback serves v0, " +
      "pointer restored, history ensure-built once") {
    val first = GovernanceOps.timeTravel(spark, sf).collect()
    assert(first.forall(_.getBoolean(4)), "rolled_back_ok must hold")
    assert(first.map(_.getInt(0)).toSet === Set(0, 1))
    // independent recompute of both snapshot states
    val o = GovernanceOps.ordersKd(spark, sf)
      .filter(col("o_orderkey") % 4 === 0)
    def expect(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(col("prio"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("c"))
      .orderBy("prio").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    def got(v: Int) = first.filter(_.getInt(0) == v)
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got(0) === expect(o.filter(col("o_orderkey") % 8 === 0)))
    assert(got(1) === expect(o))
    // the pointer is restored: the published epoch is v1 again
    val base = GovernanceOps.ttBase(sf)
    val cur = Layout.currentEpoch(spark, base).get
    // a second call must NOT rebuild the history (ensure semantics)…
    val second = GovernanceOps.timeTravel(spark, sf).collect()
    assert(Layout.currentEpoch(spark, base).get === cur)
    // …and serves the identical versions
    assert(second.map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
      === first.map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq)
  }

  test("bloomSkip: zero false negatives through the pruned scan, absent " +
      "key empty, pruning strict and deterministic") {
    val out = GovernanceOps.bloomSkip(spark, sf).collect()
    assert(out.length === 6)
    assert(out.forall(_.getBoolean(3)), "bloom_pruned must hold")
    // 5 present keys each found exactly once THROUGH the pruned scan —
    // a pruned-away true file would lose its row here (no-FN proof)
    val (present, absent) = out.splitAt(5)
    assert(present.forall(_.getLong(1) === 1L))
    assert(absent.head.getLong(1) === 0L && absent.head.getLong(2) === 0L)
    // cents are the exact lookups
    val o = GovernanceOps.ordersKd(spark, sf)
      .filter(col("o_orderkey") % 4 === 0)
    val want = o.orderBy(col("o_orderkey")).limit(5).collect()
      .map(r => (r.getLong(0), r.getLong(4))).toSeq
    assert(present.map(r => (r.getLong(0), r.getLong(2))).toSeq === want)
    // determinism across calls (hash-gated output cannot drift)
    val again = GovernanceOps.bloomSkip(spark, sf).collect()
    assert(again.map(_.toSeq).toSeq === out.map(_.toSeq).toSeq)
    // the sidecar is metadata-scale: ≤ BloomBits/64 words per file
    val t = Layout.currentEpochTable(spark, GovernanceOps.bloomBase(sf)).get
    val words = spark.table(t + "_bloom").groupBy("file_id").count()
      .agg(max("count")).head().getLong(0)
    assert(words <= GovernanceOps.BloomBits / 64)
  }

  test("vacuum: retention keeps exactly 2 epochs, drops the rest, " +
      "bounds rollback reach, never the published epoch") {
    val out = GovernanceOps.vacuum(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getBoolean(3) && r.getBoolean(4) && r.getBoolean(5)),
      "vacuumed_ok, rollback_reaches, beyond_reach_fails must all hold")
    // the published state is the newest version, independently recomputed
    val o = GovernanceOps.ordersKd(spark, sf)
      .filter(col("o_orderkey") % 4 === 0)
    val expect = o.filter(col("o_orderkey") % 8 < 5)
      .groupBy(col("prio"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("c"))
      .orderBy("prio").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      === expect)
    // catalog state: exactly two epoch tables remain, pointer on newest
    val base = GovernanceOps.vacBase(sf)
    val cur = Layout.currentEpoch(spark, base).get
    val alive = (0 to cur).filter(e =>
      spark.catalog.tableExists(Layout.epochTable(base, e)))
    assert(alive === Seq(cur - 1, cur))
  }

  test("changeFeed2: v0->v1 diff is exactly the arrival delta, all " +
      "inserts, over the shared time-travel history") {
    val out = GovernanceOps.changeFeed2(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getString(0) == "insert"), "v0 ⊆ v1 → no deletes")
    val o = GovernanceOps.ordersKd(spark, sf)
      .filter(col("o_orderkey") % 4 === 0 && col("o_orderkey") % 8 =!= 0)
    val expect = o.groupBy(col("prio"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("c"))
      .orderBy("prio").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out.map(r => (r.getString(1), r.getLong(2), r.getLong(3))).toSeq
      === expect)
    // the feed and timeTravel consume ONE history family (no rebuild):
    val base = GovernanceOps.ttBase(sf)
    val cur = Layout.currentEpoch(spark, base).get
    GovernanceOps.timeTravel(spark, sf).count()
    GovernanceOps.changeFeed2(spark, sf).count()
    assert(Layout.currentEpoch(spark, base).get === cur)
  }

  test("bloomSkipLifecycle: streamed bloom rows serve their keys; " +
      "per-batch metadata appends only") {
    val out = GovernanceOps.bloomSkipLifecycle(spark, sf).collect()
    // identical gate to the one-shot index (verbatim-oracle claim)
    val oneShot = GovernanceOps.bloomSkip(spark, sf).collect()
    assert(out.map(_.toSeq).toSeq === oneShot.map(_.toSeq).toSeq)
    assert(out.forall(_.getBoolean(3)))
    val t = Layout.currentEpochTable(spark,
      GovernanceOps.bloomLifecycleBase(sf)).get
    val o = GovernanceOps.ordersKd(spark, sf)
      .filter(col("o_orderkey") % 4 === 0)
    // every streamed row landed; streamed files carry bloom rows
    assert(spark.table(t).count() === o.count())
    val streamedBloom = spark.table(t + "_bloom")
      .filter(col("file_id") >= 1000L)
    assert(streamedBloom.select("file_id").distinct().count() >= 2L,
      "each micro-batch must append its file's bloom rows")
    // at least one planted key arrives by stream (the gate's teeth)
    val streamedKeys = spark.table(t).filter(col("file_id") >= 1000L)
      .select(col("o_orderkey"))
    val plantedStreamed = o.orderBy(col("o_orderkey")).limit(5)
      .join(streamedKeys, Seq("o_orderkey"), "left_semi").count()
    assert(plantedStreamed >= 1L)
  }

  test("copyOnWrite: only overlap files rewritten (untouched partitions " +
      "byte-stable), state equals the logical UPDATE, idempotent") {
    val first = GovernanceOps.copyOnWrite(spark, sf).collect()
    assert(first.nonEmpty)
    assert(first.forall(_.getBoolean(5)), "cow_exact must hold")
    val rewritten = first.head.getLong(3)
    val total = first.head.getLong(4)
    assert(rewritten > 0L && rewritten < total,
      s"a selective UPDATE must rewrite a strict subset ($rewritten/$total)")
    // the '0-COW' group counts exactly the in-box rows
    val o = GovernanceOps.ordersKd(spark, sf)
      .filter(col("o_orderkey") % 4 === 0)
    // the box derives from the SUB-corpus anchors
    val b = o.agg(min(col("k")), max(col("k")),
      min(col("d")), max(col("d"))).head()
    val (kLo, kHi, dLo, dHi) =
      GovernanceOps.boxOf(b.getLong(0), b.getLong(1), b.getDate(2), b.getDate(3))
    val nBox = o.filter(col("k").between(kLo, kHi) &&
      col("d").between(lit(dLo), lit(dHi))).count()
    val cowGroup = first.find(_.getString(0) == GovernanceOps.CowPrio).get
    assert(cowGroup.getLong(1) === nBox)
    // physical stability: untouched file_id partitions' files (names +
    // mtimes) must not move across a second COW call; candidates may
    val t = Layout.currentEpochTable(spark, GovernanceOps.cowBase(sf)).get
    val wh = new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath)
    val dir = new java.io.File(wh, t.toLowerCase)
    val hitIds = spark.table(t + GovernanceOps.ZmapSuffix)
      .filter(GovernanceOps.zmapOverlaps(kLo, kHi, dLo, dHi))
      .select(col("file_id")).collect().map(_.getLong(0)).toSet
    def snapshot(): Map[String, Seq[(String, Long)]] =
      dir.listFiles().filter(_.getName.startsWith("file_id=")).map { d =>
        d.getName -> d.listFiles().map(f => (f.getName, f.lastModified)).toSeq.sorted
      }.toMap
    val before = snapshot()
    val second = GovernanceOps.copyOnWrite(spark, sf).collect()
    val after = snapshot()
    // idempotence: the second UPDATE converges to the same gated rows
    assert(second.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      === first.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq)
    val untouched = before.keySet.filterNot(p =>
      hitIds.contains(p.stripPrefix("file_id=").toLong))
    assert(untouched.nonEmpty)
    untouched.foreach { p =>
      assert(before(p) === after(p), s"partition $p must be byte-stable")
    }
    // files pruned away by the overlap rule contain zero in-box rows
    // (skipping the rewrite there is semantics-preserving)
    val missed = spark.table(t)
      .filter(!col("file_id").isin(hitIds.toSeq.map(Long.box): _*))
      .filter(col("k").between(kLo, kHi) &&
        col("d").between(lit(dLo), lit(dHi))).count()
    assert(missed === 0L)
  }

  test("compactionExec: one physical file per planned bin; rewrite is lossless to the row") {
    val out = GovernanceOps.compactionExec(spark, sf).collect()
    assert(out.length === 1)
    val (nFiles, nRows, match_) =
      (out.head.getLong(0), out.head.getLong(1), out.head.getBoolean(3))
    assert(match_, "rewritten checksum must equal the base checksum")
    val e = graft.Tables.events(spark, sf)
    assert(nRows === e.count())
    // n_files equals the plan's bin count — execution matched the plan
    val nBins = GovernanceOps.compactionPlan(spark, sf)
      .select("bin").distinct().count()
    assert(nFiles === nBins)
    // set-level losslessness, stronger than the checksum: rewritten \ base
    // and base \ rewritten are both empty (multiset semantics)
    val t = graft.operators.Layout.currentEpochTable(
      spark, GovernanceOps.compactionExecBase(sf)).get
    val rw = spark.table(t).drop("bin").select(e.columns.map(col): _*)
    assert(rw.exceptAll(e).isEmpty && e.exceptAll(rw).isEmpty)
  }

  test("zonemap lifecycle: bulk + streamed appends ≡ batch; sidecar maintained per batch") {
    val out = GovernanceOps.zonemapLifecycle(spark, sf)
    val got = out.collect()
    assert(got.forall(_.getBoolean(3)), "did_prune must hold after appends")
    val o = GovernanceOps.ordersKd(spark, sf)
      .filter(col("o_orderkey") % 4 === 0) // the key's sub-corpus
    val b = o.agg(min(col("k")), max(col("k")),
      min(col("d")), max(col("d"))).head()
    val (kLo, kHi, dLo, dHi) =
      GovernanceOps.boxOf(b.getLong(0), b.getLong(1), b.getDate(2), b.getDate(3))
    val full = o
      .filter(col("k").between(kLo, kHi) &&
        col("d").between(lit(dLo), lit(dHi)))
      .groupBy(col("prio"))
      .agg(count(lit(1)).as("n_rows"), sum(col("cents")).as("cents"))
      .orderBy("prio").collect()
    assert(got.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ===
      full.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq)
    val t = Layout.currentEpochTable(spark,
      GovernanceOps.zonemapLifecycleBase(sf)).get
    val zm = spark.table(t + GovernanceOps.ZmapSuffix)
    val dataRows = spark.table(t).count()
    // 64 bulk files + one per streamed micro-batch, extents ledgered
    assert(zm.count() >= 65L)
    assert(dataRows === o.count())
    assert(zm.agg(sum("n_rows")).head().getLong(0) === dataRows)
  }

  test("winsorize: bounds and clipped sum match an exact driver recompute; " +
      "clipping is idempotent") {
    val got = GovernanceOps.winsorize(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got.nonEmpty)
    val cents = Tables.events(spark, sf)
      .select(col("event_type"), floor(col("value") * 100).cast("long").as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    for ((t, xs) <- cents) {
      // type-7 interpolation at dyadic sixteenths: h = (n-1)*k/16 is an
      // exact binary fraction, so double arithmetic below is exact
      def q(p16: Int): Double = {
        val h = (xs.length - 1).toDouble * p16 / 16d
        val i = h.toInt
        if (i + 1 < xs.length) xs(i) + (h - i) * (xs(i + 1) - xs(i)) else xs(i).toDouble
      }
      val (lo, hi) = (q(1), q(15))
      val (n, nLo, nHi, w16) = got(t)
      assert(n === xs.length.toLong, s"$t n")
      assert(nLo === xs.count(_ < lo).toLong, s"$t clipped lo")
      assert(nHi === xs.count(_ > hi).toLong, s"$t clipped hi")
      val expect16 = xs.map(x => (math.max(lo, math.min(hi, x.toDouble)) * 16).toLong).sum
      assert(w16 === expect16, s"$t wsum16")
      // DYADIC-SIXTEENTH INVARIANT PIN (r14 ADVICE): cross-engine
      // agreement of wsum16 rests on clip(cents)*16 being an EXACT
      // integer for every value — Spark CAST(double AS long) truncates
      // toward zero while DuckDB CAST(double AS BIGINT) rounds
      // half-to-even, and the two only agree when there is nothing to
      // round. If anyone edits the bound fractions away from k/16 (or
      // the ×16 scale), this assertion fails the suite rather than the
      // driver's oracle gate.
      for (x <- xs) {
        val scaled = math.max(lo, math.min(hi, x.toDouble)) * 16d
        assert(scaled == math.floor(scaled),
          s"$t: clip($x)*16=$scaled is not an exact integer — " +
            "non-dyadic winsorize bound broke the cast-agreement invariant")
      }
      // idempotence: every clipped value already lies inside [lo, hi],
      // so re-winsorizing the clipped data clips nothing
      val clipped = xs.map(x => math.max(lo, math.min(hi, x.toDouble)))
      assert(clipped.forall(v => v >= lo && v <= hi))
    }
  }

  test("multisetDiffCount ≡ exceptAll-both-ways count on arbitrary multisets") {
    // r15 optimization: the convergence/rollback probes compute the
    // symmetric-difference SIZE via one grouped count comparison
    // instead of Spark's two ExceptAll subtrees. This pins the
    // equivalence on randomized multisets WITH duplicates and nulls —
    // the two cases where a naive diff (set semantics, null-unsafe
    // join) would diverge from ExceptAll.
    import spark.implicits._
    val rnd = new scala.util.Random(15)
    for (trial <- 1 to 8) {
      def mk() = Seq.fill(rnd.nextInt(30))(
        (rnd.nextInt(4).toLong, if (rnd.nextBoolean()) null
         else s"v${rnd.nextInt(3)}"))
        .toDF("k", "s")
      val (a, b) = (mk(), mk())
      val expected =
        a.exceptAll(b).count() + b.exceptAll(a).count()
      val got = GovernanceOps.multisetDiffCount(a, b).head().getLong(0)
      assert(got === expected, s"trial $trial")
    }
  }
}
