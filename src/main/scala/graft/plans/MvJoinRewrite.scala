package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Complete, Count, Sum}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.analysis.EliminateSubqueryAliases
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, TimestampType}

import graft.Tables
import graft.operators.Layout

/** JOIN-aggregate materialized-view rewrite — the second MV shape a
  * warehouse registry needs after [[MvRewrite]]'s single-table form:
  * the reference's own `monthly_transaction_summary`
  * (main.py:197-207) is a month×client rollup over the
  * customer⋈orders⋈lineitem join, and at 100 TB that query re-joins
  * the full fact table on every dashboard refresh. The MV here is the
  * classic summary table: the 3-table join pre-joined AND
  * pre-aggregated once to (client, day) grain — day-grain keeps it
  * derivable for every month-or-coarser grain, client-grain keeps the
  * reference's GROUP BY — so the rollup becomes a re-aggregate of a
  * ~|clients|×|days| summary instead of a two-shuffle fact join.
  *
  * Matching is structural and narrow, like the single-table rule: an
  * `Aggregate` whose child strips (through optimizer-inserted
  * Projects) to an INNER equi-join tree of exactly the three base
  * scans on exactly the reference's keys (c_custkey = o_custkey,
  * o_orderkey = l_orderkey), whose every grouping expression is the
  * client name or a month-or-coarser `date_trunc` of the ship date,
  * and whose every aggregate is `count(*)` or the exact-decimal
  * `sum(cast(l_extendedprice as decimal(18,2)))`. Anything else — an
  * extra/missing join edge, a finer grain, a foreign measure — falls
  * through to the base plan (spec'd negative controls). The
  * partial-aggregate algebra is exact: count → sum of day counts,
  * decimal sum → sum of day decimal sums (associative, widened
  * losslessly, cast back to the original result type).
  */
object MvJoinRewrite {

  private val CoarseFmts = Set("month", "mon", "mm", "quarter", "year", "yyyy", "yy")

  def mvTable(sfDir: String): String =
    "graft_mv_client_daily_" + Layout.corpusTag(sfDir)

  private def fpTable(sfDir: String): String = mvTable(sfDir) + "_fp"

  /** Metadata-only freshness fingerprint over ALL THREE base tables —
    * the [[MvRewrite.ordersFingerprint]] discipline, widened to the
    * join MV's full lineage: a regenerated customer, orders, OR
    * lineitem under the same path must rebuild. */
  private[graft] def baseFingerprint(spark: SparkSession, sfDir: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    // MV SCHEMA version — bumping it makes every existing MV read as
    // stale, so a schema evolution (r13: + n_amt avg-divisor partial)
    // rebuilds instead of serving a column the rule expects but the
    // persisted table lacks
    md.update("schema:v2;".getBytes("UTF-8"))
    for (t <- Seq("customer", "orders", "lineitem")) {
      val p = new org.apache.hadoop.fs.Path(s"$sfDir/$t.parquet")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) {
        val it = fs.listFiles(p, true)
        val entries = scala.collection.mutable.ArrayBuffer[String]()
        while (it.hasNext) {
          val s = it.next()
          entries += s"${s.getPath}|${s.getLen}|${s.getModificationTime}"
        }
        entries.sorted.foreach(e => md.update((e + ";").getBytes("UTF-8")))
      } else md.update(s"absent:$t".getBytes("UTF-8"))
    }
    md.digest().map("%02x".format(_)).mkString
  }

  /** Build (once per corpus CONTENT) the day×client join MV:
    * (client_email, day, n_tx, amount) with `amount` the exact
    * decimal(28,2) day-grain sum — the widened type `sum` over
    * decimal(18,2) produces, so re-aggregation stays in exact decimal
    * arithmetic end to end. Fingerprint sidecar written AFTER the MV
    * (crash between the two re-runs the build). */
  def ensureMv(spark: SparkSession, sfDir: String): String = {
    val name = mvTable(sfDir)
    val fpName = fpTable(sfDir)
    val fp = baseFingerprint(spark, sfDir)
    // take(1).headOption: a ZERO-ROW sidecar (partial failure between
    // table creation and data commit) must read as stale, not throw
    val stale = spark.catalog.tableExists(name) &&
      (!spark.catalog.tableExists(fpName) ||
        spark.table(fpName).take(1).headOption.forall(_.getString(0) != fp))
    if (stale) {
      spark.sql(s"DROP TABLE IF EXISTS $fpName")
      spark.sql(s"DROP TABLE IF EXISTS $name")
    }
    Layout.ensureTable(spark, name) { n =>
      dayClientPartialsOf(spark, sfDir,
          Tables.lineitem(spark, sfDir)
            .select(col("l_orderkey"), col("l_shipdate"), col("l_extendedprice")))
        .write.format("parquet").saveAsTable(n)
      spark.sql(s"DROP TABLE IF EXISTS $fpName") // any orphaned sidecar
      Layout.ensureTable(spark, fpName) { f =>
        import spark.implicits._
        Seq(fp).toDF("fp").write.format("parquet").saveAsTable(f)
      }
    }
  }

  /** The MV's partial-aggregate DELTA for any lineitem-shaped fact
    * frame: join the STATIC dimensions, aggregate to (client_email,
    * day) partials. One definition shared by the bulk MV build, the
    * full-corpus [[ensureMv]], and the streamed IVM appends
    * ([[graft.streaming.MvStream.appendMvDeltasStream]]) — the encode
    * path cannot drift between build and maintenance. Count and the
    * exact-decimal sum are ASSOCIATIVE partials: deltas from any batch
    * split re-aggregate to the one-shot values to the cent. */
  private[graft] def dayClientPartialsOf(spark: SparkSession, sfDir: String,
      facts: DataFrame): DataFrame = {
    val c = Tables.customer(spark, sfDir).select(col("c_custkey"), col("c_name"))
    val o = Tables.orders(spark, sfDir).select(col("o_custkey"), col("o_orderkey"))
    c.join(o, c("c_custkey") === o("o_custkey"))
      .join(facts, o("o_orderkey") === facts("l_orderkey"))
      .groupBy(c("c_name").as("client_email"),
        to_date(col("l_shipdate")).as("day"))
      .agg(count(lit(1)).as("n_tx"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).as("amount"),
        // avg's divisor: COUNT of the measure itself (Average excludes
        // NULL measures where COUNT(*) does not) — its own associative
        // partial so the decomposition stays exact under any null mix
        count(col("l_extendedprice").cast("decimal(18,2)")).as("n_amt"))
  }

  /** The rewrite rule bound to one corpus's base paths + MV table. */
  case class ClientDailyMvRule(spark: SparkSession, sfDir: String)
      extends Rule[LogicalPlan] {

    /** Strip optimizer-inserted Projects down to the inner equi-join
      * tree, composing the alias map (PullOutGroupingExpressions +
      * column pruning interpose computed Projects) and collecting the
      * base relations by path, every equi-join condition, and the
      * attributes of pushed-down `IsNotNull` filters (InferFiltersFrom
      * Constraints materializes the inner join's implicit key-not-null
      * constraints as real Filter nodes on the scans — redundant
      * w.r.t. the MV, but only when they target JOIN KEYS, which
      * [[rewrite]] validates). Returns None on any other node — an
      * outer join, a value filter, or a fourth table means the MV does
      * not answer this query. */
    private def stripJoinTree(plan: LogicalPlan): Option[(
        Map[String, LogicalRelation],
        Map[ExprId, Expression],
        Seq[(Expression, Expression)],
        Seq[Expression])] = plan match {
      case lr @ LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
        Seq("customer", "orders", "lineitem").collectFirst {
          case t if fs.location.rootPaths.exists(
              _.toString.endsWith(s"$sfDir/$t.parquet")) =>
            (Map(t -> lr), Map.empty[ExprId, Expression],
              Seq.empty[(Expression, Expression)], Seq.empty[Expression])
        }
      case Project(ps, child) =>
        stripJoinTree(child).map { case (rels, inner, conds, nn) =>
          def inline(e: Expression): Expression = e.transformUp {
            case a: AttributeReference if inner.contains(a.exprId) => inner(a.exprId)
          }
          val here = ps.collect {
            case al @ Alias(c, _) => al.exprId -> inline(c)
          }.toMap
          (rels, inner ++ here, conds, nn)
        }
      case org.apache.spark.sql.catalyst.plans.logical.Filter(cond, child) =>
        def notNullTargets(e: Expression): Option[Seq[Expression]] = e match {
          case And(a, b) =>
            for (l <- notNullTargets(a); r <- notNullTargets(b)) yield l ++ r
          case IsNotNull(t) => Some(Seq(t))
          case _ => None
        }
        for {
          targets <- notNullTargets(cond)
          (rels, inner, conds, nn) <- stripJoinTree(child)
        } yield (rels, inner, conds, nn ++ targets)
      case Join(left, right, Inner, cond, _) =>
        for {
          (lr, li, lc, ln) <- stripJoinTree(left)
          (rr, ri, rc, rn) <- stripJoinTree(right)
          if lr.keySet.intersect(rr.keySet).isEmpty
          pairs <- equiPairs(cond)
        } yield (lr ++ rr, li ++ ri, lc ++ rc ++ pairs, ln ++ rn)
      case _ => None
    }

    /** Decompose a conjunctive join condition into equi-pairs; None if
      * any conjunct is not a plain equality. */
    private def equiPairs(cond: Option[Expression])
        : Option[Seq[(Expression, Expression)]] = cond match {
      case None => Some(Seq.empty)
      case Some(e) =>
        def split(x: Expression): Option[Seq[(Expression, Expression)]] = x match {
          case And(a, b) => for (l <- split(a); r <- split(b)) yield l ++ r
          case EqualTo(a, b) => Some(Seq((a, b)))
          case _ => None
        }
        split(e)
    }

    override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
      case agg @ Aggregate(_, _, child, _) =>
        stripJoinTree(child).flatMap { case (rels, aliasMap, conds, notNulls) =>
          if (rels.size == 3) rewrite(agg, rels, aliasMap, conds, notNulls)
          else None
        }.getOrElse(agg)
    }

    private def attr(rel: LogicalRelation, name: String): Option[AttributeReference] =
      rel.output.collectFirst {
        case a: AttributeReference if a.name == name => a
      }

    private def rewrite(agg: Aggregate, rels: Map[String, LogicalRelation],
        aliasMap: Map[ExprId, Expression],
        conds: Seq[(Expression, Expression)],
        notNulls: Seq[Expression]): Option[LogicalPlan] = {
      // a grouping-free (global) aggregate is not servable: on an empty
      // base corpus COUNT(*) returns 0 where SUM(n_tx) over the empty MV
      // returns NULL, and Sum's nullable output would change the plan's
      // schema nullability — bail out rather than alter semantics
      if (agg.groupingExpressions.isEmpty) return None
      val custKey = attr(rels("customer"), "c_custkey")
      val clientA = attr(rels("customer"), "c_name")
      val oCustKey = attr(rels("orders"), "o_custkey")
      val oOrderKey = attr(rels("orders"), "o_orderkey")
      val lOrderKey = attr(rels("lineitem"), "l_orderkey")
      val shipA = attr(rels("lineitem"), "l_shipdate")
      val priceA = attr(rels("lineitem"), "l_extendedprice")
      if (Seq(custKey, clientA, oCustKey, oOrderKey, lOrderKey, shipA, priceA)
            .exists(_.isEmpty)) return None

      // the join graph must be EXACTLY the reference's two edges
      def sameEdge(p: (Expression, Expression), a: Attribute, b: Attribute) = {
        def strip(e: Expression): Expression = e match {
          case Cast(c, _, _, _) => strip(c); case x => x
        }
        val (x, y) = (strip(p._1), strip(p._2))
        (x.semanticEquals(a) && y.semanticEquals(b)) ||
          (x.semanticEquals(b) && y.semanticEquals(a))
      }
      val edgesOk = conds.size == 2 &&
        conds.exists(sameEdge(_, custKey.get, oCustKey.get)) &&
        conds.exists(sameEdge(_, oOrderKey.get, lOrderKey.get))
      if (!edgesOk) return None

      // pushed-down IsNotNull filters are redundant ONLY on join keys
      // (the inner equi-join already excludes null keys, and MV rows
      // derive exclusively from joined rows); a not-null filter on any
      // OTHER column is a real predicate the MV cannot honor
      val keyAttrs = Seq(custKey.get, oCustKey.get, oOrderKey.get, lOrderKey.get)
      def stripCasts(e: Expression): Expression = e match {
        case Cast(c, _, _, _) => stripCasts(c); case x => x
      }
      if (!notNulls.forall(t => keyAttrs.exists(stripCasts(t).semanticEquals(_))))
        return None

      def inline(e: Expression): Expression = e.transformUp {
        case a: AttributeReference if aliasMap.contains(a.exprId) => aliasMap(a.exprId)
      }

      val mv = EliminateSubqueryAliases(
        spark.table(mvTable(sfDir)).queryExecution.analyzed)
      def mvAttr(name: String) = mv.output.collectFirst {
        case a: AttributeReference if a.name == name => a
      }.get
      val (mvClient, mvDay, mvN, mvAmount, mvNAmt) =
        (mvAttr("client_email"), mvAttr("day"), mvAttr("n_tx"), mvAttr("amount"),
          mvAttr("n_amt"))

      // sum(cast(price as decimal(18,2))) — the reference view's measure
      val amountTemplate: Expression = Cast(priceA.get, DecimalType(18, 2))

      def isShipRef(e: Expression): Boolean = e match {
        case a: AttributeReference => a.semanticEquals(shipA.get)
        case Cast(c, _, _, _) => isShipRef(c)
        case _ => false
      }
      def coarseFmtOf(e: Expression): Option[(Expression, Option[String])] = e match {
        case TruncTimestamp(f @ Literal(fmt, _), d, tz)
            if isShipRef(d) && CoarseFmts(String.valueOf(fmt).toLowerCase) =>
          Some((f, tz))
        case _ => None
      }

      val sessionTz = Option(spark.sessionState.conf.sessionLocalTimeZone)
      val groupingRepl: Seq[Option[(Expression, NamedExpression)]] =
        agg.groupingExpressions.map { g =>
          val gi = inline(g)
          if (gi.semanticEquals(clientA.get)) Some((g, mvClient))
          else coarseFmtOf(gi).map { case (fmt, tz) =>
            val e = TruncTimestamp(fmt, Cast(mvDay, TimestampType, sessionTz), tz)
            (g, Alias(e, "_mv_grouping")())
          }
        }
      if (groupingRepl.exists(_.isEmpty)) return None
      val replacements = groupingRepl.flatten

      val gAttrOf: Map[Expression, Attribute] = replacements.map {
        case (orig, named) => (orig.canonicalized, named.toAttribute)
      }.toMap

      // count(*) → sum of day counts; decimal sum → decimal sum of day
      // sums, cast back to the ORIGINAL result type so every downstream
      // reference (and the plan schema) is unchanged; avg → sum/count
      // decomposition from the same partials, rebuilt with EXACTLY the
      // operand types Average uses internally so the served value is
      // bit-identical: Average(decimal(18,2)) evaluates
      // Divide(sumBuffer: decimal(28,2), count: decimal(20,0), LEGACY)
      // .cast(decimal(22,6)) — we feed Divide the re-aggregated
      // Sum(amount) cast to the same decimal(28,2) buffer type (exact:
      // it is the very total Average's own buffer held; overflow →
      // NULL, matching nullOnOverflow) and Sum(n_amt) cast to
      // decimal(20,0), then cast to the original result type. Same
      // input types → same Divide result scale → same final rounding.
      def mergeAggregate(ae: AggregateExpression): Option[Expression] =
        ae.aggregateFunction match {
          case Count(Seq(Literal(v, _))) if v != null && !ae.isDistinct =>
            Some(AggregateExpression(Sum(mvN), Complete, isDistinct = false))
          case Sum(e, _) if inline(e).semanticEquals(amountTemplate) && !ae.isDistinct =>
            Some(Cast(
              AggregateExpression(Sum(mvAmount), Complete, isDistinct = false),
              ae.dataType, sessionTz))
          case Average(e, _) if inline(e).semanticEquals(amountTemplate) &&
              !ae.isDistinct =>
            val sumAmt = Cast(
              AggregateExpression(Sum(mvAmount), Complete, isDistinct = false),
              DecimalType(28, 2), sessionTz)
            val cnt = Cast(
              AggregateExpression(Sum(mvNAmt), Complete, isDistinct = false),
              DecimalType(20, 0), sessionTz)
            Some(Cast(Divide(sumAmt, cnt, EvalMode.LEGACY), ae.dataType, sessionTz))
          case _ => None
        }
      var rewritable = true
      agg.aggregateExpressions.foreach(_.foreachUp {
        case ae: AggregateExpression if mergeAggregate(ae).isEmpty => rewritable = false
        case _ => ()
      })
      if (!rewritable) return None

      val projected = Project(
        mv.output ++ replacements.collect { case (_, al: Alias) => al }, mv)
      def mapOut(e: Expression): Expression = e match {
        case ae: AggregateExpression => mergeAggregate(ae).get
        case other =>
          gAttrOf.get(other.canonicalized)
            .orElse(gAttrOf.get(inline(other).canonicalized))
            .getOrElse(other match {
              case a: AttributeReference if a.semanticEquals(clientA.get) => mvClient
              case x => x.mapChildren(mapOut)
            })
      }
      val newGroupings = agg.groupingExpressions.map(mapOut)
      val newAggs = agg.aggregateExpressions.map {
        case a: AttributeReference =>
          Alias(mapOut(a), a.name)(exprId = a.exprId)
        case ne => mapOut(ne).asInstanceOf[NamedExpression]
      }
      Some(Aggregate(newGroupings, newAggs, projected, None))
    }
  }

  /** Install (or refresh) the rule on the session — idempotent. */
  def install(spark: SparkSession, sfDir: String): Unit = {
    val others = spark.experimental.extraOptimizations
      .filterNot(_.isInstanceOf[ClientDailyMvRule])
    spark.experimental.extraOptimizations =
      others :+ ClientDailyMvRule(spark, sfDir)
  }

  /** Remove the rule from the session. */
  def uninstall(spark: SparkSession): Unit =
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations
        .filterNot(_.isInstanceOf[ClientDailyMvRule])

  /** The BASE query — the reference's monthly_transaction_summary
    * rollup (3-table join, month×client grain, count + exact decimal
    * amount; month as the date_trunc timestamp, terminal DOUBLE cast
    * for cross-engine comparability as in q_monthly_summary), written
    * with no knowledge of the MV. */
  private[graft] def monthlyClientRollupBase(spark: SparkSession, sfDir: String): DataFrame =
    monthlyClientRollupOf(spark, sfDir, Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_shipdate"), col("l_extendedprice")))

  /** The rollup over an explicit fact frame — the one-shot twin the
    * lifecycle spec compares its quarter-fact run against. */
  private[graft] def monthlyClientRollupOf(spark: SparkSession, sfDir: String,
      l: DataFrame): DataFrame = {
    val c = Tables.customer(spark, sfDir).select(col("c_custkey"), col("c_name"))
    val o = Tables.orders(spark, sfDir).select(col("o_custkey"), col("o_orderkey"))
    c.join(o, c("c_custkey") === o("o_custkey"))
      .join(l, o("o_orderkey") === l("l_orderkey"))
      .groupBy(date_trunc("month", col("l_shipdate")).as("month"),
        c("c_name").as("client_email"))
      .agg(count(lit(1)).as("transaction_count"),
        sum(col("l_extendedprice").cast("decimal(18,2)"))
          .cast("decimal(20,2)").cast("double").as("total_amount"))
      .orderBy(col("month"), col("client_email"))
  }

  /** q_mv_join_rewrite: ensure the join MV, install the rule, run the
    * BASE 3-table query — the oracle (plain SQL joining the base
    * tables) gates that the transparent rewrite is exact. Bounded
    * install window + fingerprint freshness, the [[MvRewrite]]
    * discipline. */
  def monthlyClientRollup(spark: SparkSession, sfDir: String): DataFrame = {
    ensureMv(spark, sfDir)
    install(spark, sfDir)
    try {
      val df = monthlyClientRollupBase(spark, sfDir)
      df.queryExecution.executedPlan // force + cache the rewritten plan
      df
    } finally uninstall(spark)
  }

  val monthlyClientRollupSql: String =
    """SELECT
      |  CAST(date_trunc('month', CAST(t.l_shipdate AS TIMESTAMP)) AS TIMESTAMP) AS month,
      |  c.c_name AS client_email,
      |  CAST(COUNT(*) AS BIGINT) AS transaction_count,
      |  CAST(CAST(SUM(CAST(t.l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(20,2)) AS DOUBLE) AS total_amount
      |FROM customer c
      |JOIN orders a ON c.c_custkey = a.o_custkey
      |JOIN lineitem t ON a.o_orderkey = t.l_orderkey
      |GROUP BY 1, 2
      |ORDER BY month, client_email""".stripMargin

  /** The avg-measure BASE query: the same month×client rollup asking
    * for AVG of the reference measure — the shape the r12 verdict noted
    * real users write constantly over monthly rollups. Output discipline
    * for the cross-engine gate: the exact columns (count + exact-decimal
    * total with the one terminal DOUBLE cast) are oracle-pinned, and the
    * served avg rides as the Spark-evaluated bound boolean
    * `avg_ok = |avg − total/n| ≤ 5.1e-7` (decimal(22,6) rounding bound
    * 0.5e-6 plus double-division slack — the sketch keys' precedent,
    * because DuckDB's AVG returns DOUBLE and cannot reproduce Spark's
    * decimal(22,6) double-rounding digit for digit). The BIT-exactness
    * of the served avg against the rule-off base avg is spec-asserted
    * (MvJoinRewriteSpec), which is the stronger check. */
  private[graft] def monthlyClientAvgBase(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir).select(col("c_custkey"), col("c_name"))
    val o = Tables.orders(spark, sfDir).select(col("o_custkey"), col("o_orderkey"))
    val l = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_shipdate"), col("l_extendedprice"))
    c.join(o, c("c_custkey") === o("o_custkey"))
      .join(l, o("o_orderkey") === l("l_orderkey"))
      .groupBy(date_trunc("month", col("l_shipdate")).as("month"),
        c("c_name").as("client_email"))
      .agg(count(lit(1)).as("transaction_count"),
        sum(col("l_extendedprice").cast("decimal(18,2)"))
          .cast("decimal(20,2)").cast("double").as("total_amount"),
        avg(col("l_extendedprice").cast("decimal(18,2)")).as("avg_dec"))
      .select(col("month"), col("client_email"), col("transaction_count"),
        col("total_amount"),
        (abs(col("avg_dec").cast("double") -
          col("total_amount") / col("transaction_count")) <= lit(5.1e-7))
          .as("avg_ok"))
      .orderBy(col("month"), col("client_email"))
  }

  /** q_mv_avg_rewrite: ensure the MV, install the rule, run the BASE
    * avg rollup — the rewrite must serve count, sum, AND the avg
    * decomposition from the day×client partials. */
  def monthlyClientAvgRollup(spark: SparkSession, sfDir: String): DataFrame = {
    ensureMv(spark, sfDir)
    install(spark, sfDir)
    try {
      val df = monthlyClientAvgBase(spark, sfDir)
      df.queryExecution.executedPlan // force + cache the rewritten plan
      df
    } finally uninstall(spark)
  }

  val monthlyClientAvgRollupSql: String =
    """SELECT
      |  CAST(date_trunc('month', CAST(t.l_shipdate AS TIMESTAMP)) AS TIMESTAMP) AS month,
      |  c.c_name AS client_email,
      |  CAST(COUNT(*) AS BIGINT) AS transaction_count,
      |  CAST(CAST(SUM(CAST(t.l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(20,2)) AS DOUBLE) AS total_amount,
      |  TRUE AS avg_ok
      |FROM customer c
      |JOIN orders a ON c.c_custkey = a.o_custkey
      |JOIN lineitem t ON a.o_orderkey = t.l_orderkey
      |GROUP BY 1, 2
      |ORDER BY month, client_email""".stripMargin

  /** [[monthlyClientRollupSql]] restricted to [[mvLifecycle]]'s
    * quarter of the fact table. */
  val mvLifecycleSql: String =
    """SELECT
      |  CAST(date_trunc('month', CAST(t.l_shipdate AS TIMESTAMP)) AS TIMESTAMP) AS month,
      |  c.c_name AS client_email,
      |  CAST(COUNT(*) AS BIGINT) AS transaction_count,
      |  CAST(CAST(SUM(CAST(t.l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(20,2)) AS DOUBLE) AS total_amount
      |FROM customer c
      |JOIN orders a ON c.c_custkey = a.o_custkey
      |JOIN lineitem t ON a.o_orderkey = t.l_orderkey
      |WHERE t.l_orderkey % 4 = 0
      |GROUP BY 1, 2
      |ORDER BY month, client_email""".stripMargin

  private[graft] def mvLifecycleBase(sfDir: String): String =
    "graft_mvlc_" + Layout.corpusTag(sfDir)

  /** INCREMENTAL-VIEW-MAINTENANCE lifecycle (stream ≡ batch #15) — the
    * maintenance story the [[monthlyClientRollup]] rewrite presumes: a
    * summary table is only useful if it can be kept CURRENT without
    * re-joining the full fact table. Even l_orderkey facts bulk-build
    * a fresh partials epoch (one shot of [[dayClientPartialsOf]]); the
    * odd half replays as a parquet-source stream through
    * [[graft.streaming.MvStream.appendMvDeltasStream]] — per batch:
    * static-dim join, day×client DELTA aggregate, append. Serving
    * re-aggregates the accumulated partials to the month×client rollup
    * under the VERBATIM [[monthlyClientRollupSql]] oracle — the driver
    * hash-match proves bulk build + streamed deltas ≡ the one-pass
    * 3-table join to the cent. Deterministic with no watermark or
    * sentinel machinery because the served rollup is a pure function
    * of the partial-row SET (count/decimal-sum partials are
    * associative and commutative), the accumulated-state lifecycle
    * shape. Rotates a fresh epoch per call, prunes to two.
    */
  def mvLifecycle(spark: SparkSession, sfDir: String): DataFrame = {
    val base = mvLifecycleBase(sfDir)
    // quarter-fact sub-corpus (l_orderkey % 4 = 0) under the matching
    // filtered oracle ([[mvLifecycleSql]]) — r14 lifecycle fixed-cost
    // discipline: partial-row associativity is fact-set invariant, the
    // per-call rebuild over 600K facts is not. The REWRITE keys
    // (q_mv_join_rewrite et al.) keep the full-fact oracle.
    val l = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_shipdate"), col("l_extendedprice"))
      .filter(col("l_orderkey") % 4 === 0)
    val t = Layout.rotateEpoch(spark, base) { name =>
      dayClientPartialsOf(spark, sfDir, l.filter(col("l_orderkey") % 8 === 0))
        .write.format("parquet").mode("overwrite").saveAsTable(name)
    }
    val odd = l.filter(col("l_orderkey") % 8 =!= 0)
    Layout.withStagedParquet(odd.repartition(4), "graft-mvlc") { dir =>
      val stream = graft.streaming.MvStream.appendMvDeltasStream(
        spark.readStream.schema(odd.schema)
          .option("maxFilesPerTrigger", 2).parquet(dir), sfDir, t)
      try stream.processAllAvailable() finally stream.stop()
    }
    Layout.pruneEpochs(spark, base, keep = 2)
    spark.table(t)
      .groupBy(date_trunc("month", col("day").cast("timestamp")).as("month"),
        col("client_email"))
      .agg(sum(col("n_tx")).as("transaction_count"),
        sum(col("amount")).cast("decimal(20,2)").cast("double").as("total_amount"))
      .orderBy(col("month"), col("client_email"))
  }
}
