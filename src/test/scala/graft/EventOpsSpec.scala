package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.EventOps

class EventOpsSpec extends SparkSpec {

  private def ts(min: Long): Timestamp = new Timestamp(min * 60000L)

  test("sessionize splits on gaps > threshold, per user") {
    val s = spark; import s.implicits._
    val df = Seq(
      ("u1", ts(0), 1L), ("u1", ts(10), 2L),   // same session (10 min gap)
      ("u1", ts(50), 3L),                       // new session (40 min gap)
      ("u2", ts(0), 4L),                        // separate user
    ).toDF("user_id", "ts", "event_id")
    val got = EventOps.sessionize(df, "user_id", "ts", Seq("event_id"), 1800000000L)
      .select("user_id", "event_id", "session_id")
      .orderBy("user_id", "event_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq(("u1", 1L, 1L), ("u1", 2L, 1L), ("u1", 3L, 2L), ("u2", 4L, 1L)))
  }

  test("sessionize tie-break on order column is deterministic") {
    val s = spark; import s.implicits._
    val df = Seq(("u", ts(0), 2L), ("u", ts(0), 1L)).toDF("user_id", "ts", "event_id")
    val got = EventOps.sessionize(df, "user_id", "ts", Seq("event_id"), 1L)
      .orderBy("event_id").select("event_id", "session_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // zero gap → same session regardless of tie order
    assert(got === Seq((1L, 1L), (2L, 1L)))
  }

  test("sessionizeSkewSafe: identical output to sessionize with one bot holding half the events") {
    val s = spark; import s.implicits._
    // bot: 600 events, one per minute (sessions break at >30 min gaps via
    // planted holes); 5 normal users with 120 events each → bot ≈ 50%
    val bot = (0 until 600).map { i =>
      val minute = i + (i / 97) * 45L // every ~97 events, a 45-min hole
      ("bot", ts(minute), 100000L + i)
    }
    val normals = for (u <- 1 to 5; i <- 0 until 120)
      yield (s"u$u", ts(i * 7L + (i / 31) * 60L), u * 1000L + i)
    val df = s.createDataFrame(bot ++ normals).toDF("user_id", "ts", "event_id")
    val gap = 1800000000L
    val plain = EventOps.sessionize(df, "user_id", "ts", Seq("event_id"), gap)
      .select("user_id", "event_id", "session_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // threshold 300 → only the bot takes the segmented path; 1-hour segments
    val segMicros = 3600000000L
    val safe = EventOps.sessionizeSkewSafe(df, "user_id", "ts", Seq("event_id"),
      gap, heavyThreshold = 300L, segmentMicros = segMicros)
    val got = safe.select("user_id", "event_id", "session_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === plain)
    // the boundedness claim: no (user, segment) window slice on the heavy
    // path exceeds the events that fit one segment, so the bot's 600-event
    // partition never materializes as a single window task
    val maxSlice = df.filter(col("user_id") === "bot")
      .groupBy(expr(s"unix_micros(ts) div $segMicros")).count()
      .agg(max("count")).head().getLong(0)
    assert(maxSlice <= 60L) // one event/min, 60-min segments (+ holes)
    assert(maxSlice < 600L) // strictly better than the unsegmented partition
  }

  test("eventWindows covers every event exactly once") {
    val w = EventOps.eventWindows(spark, sf)
    val total = w.agg(sum("n_events")).head().getLong(0)
    assert(total === Tables.events(spark, sf).count())
  }

  test("jsonExtract aggregates per event_type with non-null counts") {
    val j = EventOps.jsonExtract(spark, sf).collect()
    assert(j.nonEmpty)
    assert(j.forall(r => r.getLong(1) > 0))
  }

  test("asofClickPurchase agrees with the naive greatest-prior-click join") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sf)
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts")).agg(max(col("event_id")).as("c_id"))
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"), col("c_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"))
    // naive theta join + argmax — quadratic, fine at sf0.001
    val naive = purchases
      .join(clicks, col("user_id") === col("c_user") && col("c_ts") <= col("ts"), "left")
      .groupBy(col("purchase_id"))
      .agg(max(struct(col("c_ts"), col("c_id"))).as("best"))
      .select(col("purchase_id"), col("best.c_id").as("click_id"))
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap
    val asof = EventOps.asofClickPurchase(spark, sf)
      .select(col("purchase_id"), col("click_id"))
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap
    assert(asof === naive)
  }

  test("rangeJoinErrorViews agrees with the naive theta join") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sf)
    val errs = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("user_id").as("e_user"),
        unix_micros(col("ts")).as("e_us"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), unix_micros(col("ts")).as("v_us"))
    val d = 5L * 60 * 1000000
    val naive = errs
      .join(views, col("e_user") === col("v_user") &&
        col("v_us") >= col("e_us") - d && col("v_us") < col("e_us"), "left")
      .groupBy(col("error_id"))
      .agg(count(col("v_us")).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val binned = EventOps.rangeJoinErrorViews(spark, sf)
      .select(col("error_id"), col("n_views_5min"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(binned === naive)
  }

  test("funnel: conversion curve is monotone and matches a driver replay") {
    import org.apache.spark.sql.functions._
    val out = EventOps.funnelSteps(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.map(_._1).toSeq === Seq(1L, 2L, 3L))
    assert(out.map(_._2).toSeq === Seq("view", "click", "purchase"))
    val counts = out.map(_._3)
    assert(counts(0) >= counts(1) && counts(1) >= counts(2)) // monotone
    // independent per-user state-machine replay on the driver
    val byUser = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1)
    var n1 = 0L; var n2 = 0L; var n3 = 0L
    byUser.values.foreach { evs =>
      val t1 = evs.filter(_._2 == "view").map(_._3).minOption
      val t2 = t1.flatMap(t => evs.filter(e => e._2 == "click" && e._3 > t).map(_._3).minOption)
      val t3 = t2.flatMap(t => evs.filter(e => e._2 == "purchase" && e._3 > t).map(_._3).minOption)
      if (t1.isDefined) n1 += 1; if (t2.isDefined) n2 += 1; if (t3.isDefined) n3 += 1
    }
    assert(counts.toSeq === Seq(n1, n2, n3))
  }

  test("cohortRetention: week-0 cell IS the cohort (retention 1.0), cells never exceed it") {
    val d = EventOps.cohortRetention(spark, sf).collect()
    assert(d.nonEmpty)
    val byCohort = d.groupBy(_.getDate(0))
    byCohort.values.foreach { rows =>
      val sorted = rows.sortBy(_.getLong(1))
      assert(sorted.head.getLong(1) === 0L,
        "every cohort must have its own week-0 cell")
      assert(sorted.head.getDouble(3) === 1.0)
      val size = sorted.head.getLong(2)
      sorted.foreach { r =>
        assert(r.getLong(2) <= size, "a cell cannot out-count its cohort")
        assert(r.getDouble(3) === r.getLong(2).toDouble / size)
      }
    }
    // cohorts partition the user base: sizes sum to the distinct users
    val nUsers = Tables.events(spark, sf).select(col("user_id")).distinct().count()
    assert(byCohort.values.map(_.minBy(_.getLong(1)).getLong(2)).sum === nUsers)
    // driver replay: recompute the triangle from raw events
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), to_date(date_trunc("week", col("ts"))).as("w"))
      .distinct().collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val cohortOf = evs.groupBy(_._1).map { case (u, ws) => (u, ws.map(_._2).min) }
    val cells = evs.groupBy { case (u, w) =>
      (cohortOf(u), java.time.temporal.ChronoUnit.DAYS.between(cohortOf(u), w) / 7)
    }.map { case (k, v) => (k, v.length.toLong) }
    assert(d.map(r => ((r.getDate(0).toLocalDate, r.getLong(1)), r.getLong(2))).toMap === cells)
  }

  test("markovTransitions: rows normalize to 1 per from_type, counts replay") {
    val d = EventOps.markovTransitions(spark, sf).collect()
    d.groupBy(_.getString(0)).values.foreach { rows =>
      assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-12)
      rows.foreach(r => assert(r.getDouble(3) ===
        r.getLong(2).toDouble / rows.map(_.getLong(2)).sum))
    }
    // driver replay: per-user (ts, event_id)-ordered successor pairs
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val pairs = evs.groupBy(_._1).values.flatMap { u =>
      val s = u.sortBy(e => (e._2, e._3)).map(_._4)
      s.zip(s.tail)
    }.toSeq.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(d.map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap === pairs)
  }

  test("intervalAnti: partitions clicks disjointly with the matched set") {
    val anti = EventOps.intervalAnti(spark, sf)
      .select(col("click_id")).collect().map(_.getLong(0)).toSet
    val matched = EventOps.clickPurchaseBatch(
      Tables.events(spark, sf)
        .filter(col("event_type").isin("click", "purchase"))
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value")))
      .select(col("click_id")).distinct().collect().map(_.getLong(0)).toSet
    val allClicks = Tables.events(spark, sf)
      .filter(col("event_type") === "click")
      .select(col("event_id")).collect().map(_.getLong(0)).toSet
    assert((anti & matched).isEmpty)
    assert((anti | matched) === allClicks)
  }

  test("gapFill: per-user grid is complete and consecutive, zero-fill and " +
      "forward-fill match a driver recompute") {
    val rows = EventOps.gapFill(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDate(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val byUser = rows.groupBy(_._1)
    // independent recompute of the daily rollup
    val daily = Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("d"),
        floor(col("value") * 100).cast("long").as("cents"))
      .groupBy(col("user_id"), col("d"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("c")).collect()
      .map(r => (r.getLong(0), r.getDate(1)) -> (r.getLong(2), r.getLong(3))).toMap
    for ((u, rs) <- byUser) {
      val sorted = rs.sortBy(_._2.getTime)
      // consecutive days from first to last active day, no holes
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._2.getTime - a._2.getTime === 86400000L,
            s"gap or duplicate between ${a._2} and ${b._2} for user $u")
        case _ =>
      }
      assert(daily.contains((u, sorted.head._2)), s"user $u grid starts on an active day")
      assert(daily.contains((u, sorted.last._2)), s"user $u grid ends on an active day")
      var ff = Option.empty[Long]
      for ((_, d, n, cff) <- sorted) {
        daily.get((u, d)) match {
          case Some((dn, dc)) => assert(n === dn); ff = Some(dc)
          case None           => assert(n === 0L, s"silent day $d for $u zero-filled")
        }
        assert(ff.nonEmpty && cff === ff.get, s"forward fill at $d for $u")
      }
    }
    // the densified grid genuinely adds silent days at this SF
    assert(rows.length > daily.size, "no gaps were filled - fixture too dense to prove anything")
  }
}
