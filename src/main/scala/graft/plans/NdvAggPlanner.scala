package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Sum}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, JoinHint, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

import graft.Tables
import graft.operators.Layout

/** NDV-driven AGGREGATE planning — the third planner signal after the
  * CMS hint rule (join algorithm) and the CMS reorder rule (join
  * order): an HLL sidecar of per-column distinct counts consumed by a
  * rule that decides WHERE the aggregation runs relative to a join.
  *
  * The decision is the classic eager/lazy aggregation transform (Yan &
  * Larson, VLDB '95): for `Agg[g](A ⋈ B on k)` where the group keys
  * come from A and every aggregate consumes only B (or counts rows),
  * pre-aggregating B by its join key first —
  * `Agg[g](A ⋈ Agg[k, partials](B))` — shrinks the join's probe input
  * from |B| rows to NDV(B.k) GROUPS and turns the final aggregate into
  * a rollup of partials. Whether that is a win is purely a cardinality
  * question: at NDV(B.k) ≈ |B| the pre-aggregate is a wasted shuffle
  * (every "group" is one row); at NDV ≪ |B| it is the difference
  * between shuffling a 100 TB fact table into a join and shuffling its
  * per-key partials. Spark's CBO only sees this with ANALYZE-collected
  * column stats; this rule reads the engine's own HLL sidecar
  * ([[Registry]] columns, `approx_count_distinct` at 2%, one scan per
  * table, metadata-fingerprint fresh) and rewrites only when
  * `ndv · [[ReductionFactor]] ≤ n_rows` — the sketch error margin is
  * absorbed by the factor-2 slack.
  *
  * Soundness envelope (everything else is left untouched):
  *  - inner single-equi-attr join, no user hint (reuses
  *    [[CmsJoinPlanner.equiAttrs]] so key resolution cannot drift);
  *  - group keys are pure attributes of the NON-pushed side;
  *  - aggregates are Sum over an integral (int/long) pushed-side
  *    attribute, Count(1)/Count(*), or Count(pushed attr) — the
  *    decomposable set whose partial-rollup is EXACT; float/decimal
  *    sums are excluded because re-associating their addition changes
  *    ulps (the engine's exact-integer discipline), and count partials
  *    roll up as sums;
  *  - the pushed side resolves through pure projections / IsNotNull
  *    filters (plus one value-computing Project: a derived measure
  *    column like `floor(price·100)` is still per-row B state) to ONE
  *    registered base table whose join-key column the sidecar
  *    sketches.
  *
  * Correctness does not depend on the estimate: the rewrite is exact
  * for the admitted shape regardless of NDV (duplicate matches on the
  * A side multiply partials exactly as they would multiply rows);
  * NDV only decides whether to do it. NdvAggPlannerSpec asserts the
  * plan flips BOTH ways (FK fact side: 4×-reduction key → pre-agg
  * appears; unique-key side → plan untouched) plus rule-off row
  * identity; q_ndv_agg_planned gates result identity under the oracle
  * with the rule installed.
  *
  * Scale shape: the sidecar is a ≤|Registry|-row catalog table; the
  * rule's driver state is that map. The rewrite itself REMOVES data
  * movement (pre-agg is map-side-combinable on the fact's natural
  * key), never adds any.
  */
object NdvAggPlanner {

  /** Rewrite only past a 2× sketch-certain reduction: HLL at 2% error
    * cannot turn a no-win (ndv ≈ n) into a "2× win". */
  val ReductionFactor = 2L

  /** Sketched (table, column) pairs: the FK join keys of the reference
    * chain's edges — the fact-side keys eager aggregation targets —
    * plus the PK sides whose ndv ≈ n makes the rule decline. */
  private[graft] val Registry: Seq[(String, String)] = Seq(
    ("lineitem", "l_orderkey"),
    ("orders", "o_orderkey"),
    ("orders", "o_custkey"),
    ("customer", "c_custkey"),
    ("events", "user_id"))

  def statsTable(sfDir: String): String =
    "graft_ndv_stats_" + Layout.corpusTag(sfDir)

  private def fpTable(sfDir: String): String = statsTable(sfDir) + "_fp"

  private def tableFrame(spark: SparkSession, sfDir: String, t: String): DataFrame =
    t match {
      case "customer" => Tables.customer(spark, sfDir)
      case "orders" => Tables.orders(spark, sfDir)
      case "lineitem" => Tables.lineitem(spark, sfDir)
      case "events" => Tables.events(spark, sfDir)
    }

  /** Metadata-only freshness fingerprint (the CmsJoinPlanner
    * discipline, own prefix). */
  private[graft] def baseFingerprint(spark: SparkSession, sfDir: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update("ndv_stats:v1;".getBytes("UTF-8"))
    for (t <- Registry.map(_._1).distinct.sorted) {
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

  /** Build (once per corpus CONTENT) the NDV sidecar: one row per
    * registered column — (table, column, n_rows, ndv) from ONE scan
    * per table (all of a table's HLLs run in a single Aggregate). */
  def ensureStats(spark: SparkSession, sfDir: String): String = {
    val name = statsTable(sfDir)
    val fpName = fpTable(sfDir)
    val fp = baseFingerprint(spark, sfDir)
    val stale = spark.catalog.tableExists(name) &&
      (!spark.catalog.tableExists(fpName) ||
        spark.table(fpName).take(1).headOption.forall(_.getString(0) != fp))
    if (stale) {
      spark.sql(s"DROP TABLE IF EXISTS $fpName")
      spark.sql(s"DROP TABLE IF EXISTS $name")
    }
    Layout.ensureTable(spark, name) { n =>
      val perTable = Registry.groupBy(_._1).toSeq.sortBy(_._1).map {
        case (t, cols) =>
          val aggs = count(lit(1)).as("n_rows") +:
            cols.map { case (_, c) =>
              approx_count_distinct(col(c), 0.02).as(s"ndv_$c") }
          val row = tableFrame(spark, sfDir, t).agg(aggs.head, aggs.tail: _*)
          val stacked = cols.map { case (_, c) =>
            row.select(lit(t).as("table"), lit(c).as("column"),
              col("n_rows"), col(s"ndv_$c").as("ndv"))
          }
          stacked.reduce(_.unionByName(_))
      }
      perTable.reduce(_.unionByName(_)).coalesce(1)
        .write.format("parquet").saveAsTable(n)
      spark.sql(s"DROP TABLE IF EXISTS $fpName")
      Layout.ensureTable(spark, fpName) { f =>
        import spark.implicits._
        Seq(fp).toDF("fp").write.format("parquet").saveAsTable(f)
      }
    }
  }

  private[plans] def loadStats(spark: SparkSession, sfDir: String)
      : Map[(String, String), (Long, Long)] =
    spark.table(statsTable(sfDir)).collect().map { r =>
      (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3)))
    }.toMap

  /** Resolve a plan to its single registered base table, tolerating
    * Projects (computing ones included — a derived measure is still
    * per-row state of the same table) and IsNotNull-only Filters. */
  private[plans] def tableOf(sfDir: String, plan: LogicalPlan): Option[String] =
    plan match {
      case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
        Registry.map(_._1).distinct.find(t =>
          fs.location.rootPaths.exists(
            _.toString.endsWith(s"$sfDir/$t.parquet")))
      case Project(_, child) => tableOf(sfDir, child)
      case Filter(cond, child) =>
        def onlyNotNull(e: Expression): Boolean = e match {
          case And(a, b) => onlyNotNull(a) && onlyNotNull(b)
          case IsNotNull(_) => true
          case _ => false
        }
        if (onlyNotNull(cond)) tableOf(sfDir, child) else None
      case _ => None
    }

  /** The eager-aggregation rule bound to one corpus's sidecar. */
  case class NdvEagerAggRule(spark: SparkSession, sfDir: String)
      extends Rule[LogicalPlan] {

    private lazy val stats: Map[(String, String), (Long, Long)] =
      loadStats(spark, sfDir)

    /** Peel optimizer-inserted pure-attr pruning Projects. */
    private def joinOf(p: LogicalPlan): Option[Join] = p match {
      case j: Join => Some(j)
      case Project(pl, child) if pl.forall(_.isInstanceOf[AttributeReference]) =>
        joinOf(child)
      case _ => None
    }

    /** One admitted aggregate: its partial on the pushed side and the
      * rollup that replaces it, sharing the original Alias exprId. */
    private def decompose(agg: NamedExpression, pushed: LogicalPlan,
        idx: Int): Option[(NamedExpression, AttributeReference => NamedExpression)] =
      agg match {
        case al @ Alias(AggregateExpression(Sum(x: AttributeReference, mode), Complete, false, None, _), name)
            if pushed.outputSet.contains(x) &&
              (x.dataType == LongType || x.dataType == IntegerType) =>
          val partial = Alias(AggregateExpression(
            Sum(x, mode), Complete, isDistinct = false), s"_presum_$idx")()
          Some((partial, (pa: AttributeReference) => Alias(
            AggregateExpression(Sum(pa), Complete, isDistinct = false),
            name)(exprId = al.exprId)))
        case al @ Alias(AggregateExpression(Count(children), Complete, false, None, _), name)
            if children.forall {
              case _: Literal => true
              case a: AttributeReference => pushed.outputSet.contains(a)
              case _ => false
            } =>
          val partial = Alias(AggregateExpression(
            Count(children), Complete, isDistinct = false), s"_precnt_$idx")()
          Some((partial, (pa: AttributeReference) => Alias(
            AggregateExpression(Sum(pa), Complete, isDistinct = false),
            name)(exprId = al.exprId)))
        case _ => None
      }

    override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
      case agg @ Aggregate(groupExprs, aggExprs, child, None) =>
        (for {
          j <- joinOf(child)
          if j.joinType == Inner && j.hint == JoinHint.NONE && j.condition.isDefined
          (lk, rk) <- CmsJoinPlanner.equiAttrs(j.condition.get, j.left, j.right)
          // which side is pushable? group keys must ALL come from the
          // other side; every aggregate must decompose over the pushed
          (pushed, keep, jk) <-
            (if (groupExprs.forall(e => e.references.subsetOf(j.left.outputSet)))
              Some((j.right, j.left, rk))
            else if (groupExprs.forall(e => e.references.subsetOf(j.right.outputSet)))
              Some((j.left, j.right, lk))
            else None): Option[(LogicalPlan, LogicalPlan, AttributeReference)]
          if groupExprs.forall(_.isInstanceOf[AttributeReference])
          t <- tableOf(sfDir, pushed)
          (n, ndv) <- stats.get((t, jk.name))
          if ndv * ReductionFactor <= n // the sidecar's verdict
          // split the output list: group-key passthroughs (no aggregate
          // function — they stay verbatim) vs true aggregates (every
          // one must decompose over the pushed side)
          decomposed <- {
            val aggOnly = aggExprs.filter(_.exists(
              _.isInstanceOf[AggregateExpression]))
            val ds = aggOnly.zipWithIndex.map {
              case (e, i) => decompose(e, pushed, i) }
            if (ds.forall(_.isDefined) && ds.nonEmpty)
              Some(aggOnly.zip(ds.map(_.get)))
            else None
          }
        } yield {
          val partials = decomposed.map(_._2._1)
          val pre = Aggregate(Seq(jk), jk +: partials, pushed)
          val preAttrs = partials.map(_.toAttribute.asInstanceOf[AttributeReference])
          val rollupByOrig: Map[NamedExpression, NamedExpression] =
            decomposed.zip(preAttrs).map {
              case ((orig, (_, mk)), pa) => orig -> mk(pa) }.toMap
          val newJoin =
            if (pushed eq j.right) j.copy(right = pre)
            else j.copy(left = pre)
          // original output order: group-key passthroughs stay, each
          // aggregate is replaced by its rollup under the SAME exprId
          val newAggExprs = aggExprs.map(e => rollupByOrig.getOrElse(e, e))
          Aggregate(groupExprs, newAggExprs, newJoin)
        }).getOrElse(agg)
    }
  }

  /** Install (or refresh) the rule on the session — idempotent. */
  def install(spark: SparkSession, sfDir: String): Unit = {
    ensureStats(spark, sfDir)
    val others = spark.experimental.extraOptimizations
      .filterNot(_.isInstanceOf[NdvEagerAggRule])
    spark.experimental.extraOptimizations =
      others :+ NdvEagerAggRule(spark, sfDir)
  }

  def uninstall(spark: SparkSession): Unit =
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations
        .filterNot(_.isInstanceOf[NdvEagerAggRule])

  /** The BASE query — the reference chain's fact rollup written with no
    * knowledge of the rule: priorities × (item count, exact cents). */
  private[graft] def priorityCentsBase(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_orderpriority"))
    val l = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"),
        floor(col("l_extendedprice") * 100).cast("long").as("cents"))
    o.join(l, o("o_orderkey") === l("l_orderkey"))
      .groupBy(col("o_orderpriority").as("priority"))
      .agg(count(lit(1)).as("n_items"), sum(col("cents")).as("cents"))
      .orderBy(col("priority"))
  }

  /** q_ndv_agg_planned: ensure the HLL sidecar, install the rule, run
    * the base FK rollup — the fact side's 4×-reduction join key must
    * carry the eager-aggregation decision, and the oracle gates that
    * the re-planned aggregate is exact. Bounded install window. */
  def ndvPlannedAgg(spark: SparkSession, sfDir: String): DataFrame = {
    install(spark, sfDir)
    try {
      val df = priorityCentsBase(spark, sfDir)
      df.queryExecution.executedPlan // force + cache the re-planned agg
      df
    } finally uninstall(spark)
  }

  val ndvPlannedAggSql: String =
    """SELECT o.o_orderpriority AS priority,
      |  CAST(COUNT(*) AS BIGINT) AS n_items,
      |  CAST(SUM(CAST(floor(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
      |FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      |GROUP BY 1
      |ORDER BY priority""".stripMargin
}
