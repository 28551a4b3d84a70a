package graft.cv

import org.apache.spark.sql.{Column, DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Expression, SortOrder, WindowExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.functions.{col, lit}
import scala.collection.mutable

/** The continuous-view planner — the Spark analogue of the reference's
  * `TransformSelectStmtForContProcess` (/root/reference/src/analyzer.c:
  * 2762-3078): takes the CV's SELECT (parsed and analyzed by Catalyst
  * against the registered stream schema), enforces the reference's
  * restriction wall (analyzer.c:1183-1344), and splits every aggregate into
  * (partial-state column, merge aggregate, finalize expression).
  *
  * The child plan below the Aggregate (projections, filters, stream–table
  * joins) is kept as an analyzed LogicalPlan; at ingest time the stream
  * leaf (an empty LocalRelation registered for the stream) is substituted
  * with the micro-batch's plan, preserving attribute exprIds so the whole
  * tree stays resolved — the planner runs once per CV, not per batch.
  */
object CvPlanner {

  /** Metadata key carrying a state column's combine-kind descriptor. */
  val CombineKindKey = "graft.combine"

  /** Metadata keys carrying a sliding-window CV's window spec on its state
    * columns, so SQL `sw_combine(col)` over `<cv>_mrel` can rebuild the
    * read-time liveness filter (reference sw_combine,
    * pipelinedb--1.0.0.sql:122-140) with no engine handle in scope.
    */
  val SwBucketKey = "graft.sw.bucket"
  val SwWindowKey = "graft.sw.windowSeconds"

  /** Hidden raw-timestamp column stored by sliding-window APPEND CVs: the
    * read-time liveness filter is exact per row (the reference filters the
    * raw arrival_timestamp for non-aggregating SW CVs rather than a step
    * bucket — there is no merge, so nothing forces bucket granularity).
    */
  val AppendSwTs = "__sw_ts"

  // §2.10 extension point: user-registrable combinable aggregates — the
  // counterpart of the reference's pipelinedb.combine catalog +
  // search_for_combine_aggregate (analyzer.c:4181-4330). Keyed by the
  // aggregate function's prettyName as it appears in the analyzed plan.
  private val customSplits =
    mutable.Map.empty[String, AggregateExpression => AggSplit]

  /** Make a custom aggregate usable inside continuous views by supplying
    * its partial/merge/finalize split. Also registers the split's kind for
    * SQL combine()/finalize() resolution when the returned AggSplit carries
    * a non-empty kind.
    */
  def registerCombinable(fnName: String, split: AggregateExpression => AggSplit): Unit =
    customSplits(fnName.toLowerCase) = split

  final case class CvOptions(
      sw: Option[String] = None,          // sliding window width, e.g. "1 hour"
      swColumn: String = "arrival_timestamp",
      stepFactor: Double = 5.0,           // bucket = stepFactor% of window
      ttl: Option[String] = None,
      ttlColumn: Option[String] = None,
      // pk = physical row-identity column of the matrel (cont_pk.sql;
      // pipeline_query.c:903). Our state table is keyed by the group
      // columns themselves, so the option is validated (must name an
      // output column) and carried in the catalog for parity — the
      // hidden-$pk machinery it configures in the reference is a heap-
      // table detail Spark state has no analogue of.
      pk: Option[String] = None)

  /** The reference's PRIMARY sliding-window spelling is the explicit
    * predicate `WHERE <ts> > clock_timestamp() - interval '<w>'` (every
    * cont_sw_* regress test; desugared by analyzer.c:1672-1768 — the
    * `WITH (sw = …)` option is itself sugar for this). Spark has no
    * clock_timestamp(), so detect the pattern textually, strip it from the
    * SELECT, and fold it into CvOptions before Catalyst analysis. Only the
    * leading-WHERE position is recognized (the regress shapes); an
    * AND-combined rest of the predicate is preserved.
    */
  private val SwPredRe =
    ("""(?is)\bWHERE\s+(\w+)\s*>\s*clock_timestamp\s*\(\s*\)\s*-\s*""" +
      """interval\s*'([^']+)'\s*(AND\b)?""").r

  def desugarSwPredicate(selectSql: String, options: CvOptions): (String, CvOptions) = {
    val (stripped, opts) = SwPredRe.findFirstMatchIn(selectSql) match {
      case Some(m) if options.sw.isEmpty =>
        // an OR-combined window predicate is not a top-level conjunct:
        // stripping it would silently change which rows the CV admits
        if (m.group(3) == null &&
            """(?is)^\s*OR\b""".r.findFirstIn(selectSql.substring(m.end)).isDefined)
          throw new IllegalArgumentException(
            "clock_timestamp() may only appear as a top-level WHERE conjunct " +
              "(AND-combined), not under OR")
        val s = selectSql.substring(0, m.start) +
          (if (m.group(3) != null) " WHERE " else " ") +
          selectSql.substring(m.end)
        (s, options.copy(sw = Some(m.group(2)), swColumn = m.group(1)))
      case Some(_) =>
        throw new IllegalArgumentException(
          "cannot combine WITH (sw = …) with an explicit clock_timestamp() window predicate")
      case None => (selectSql, options)
    }
    // Any clock_timestamp() surviving the desugar is a malformed window
    // predicate — NOT/OR-wrapped, a second occurrence, or a non-leading
    // position. Reject it as a domain error here (analyze_cont_view.sql:
    // "clock_timestamp() may only appear as a top-level conjunction
    // predicate" / "… may only appear once") instead of letting Catalyst
    // fail with an opaque unknown-function message.
    if ("""(?i)clock_timestamp\s*\(""".r.findFirstIn(stripped).isDefined)
      throw new IllegalArgumentException(
        "clock_timestamp() may only appear once, as a top-level WHERE " +
          "conjunct of the form <ts> > clock_timestamp() - interval '…'")
    (stripped, opts)
  }

  final case class SwSpec(windowSeconds: Long, stepSeconds: Long, tsColumn: String) {
    val bucketCol = "__sw_bucket"
  }

  /** One output column of a CV: possibly several state columns (a scalar
    * expression over multiple aggregates decomposes into one state per
    * contained aggregate) plus a finalizer rebuilding the output from the
    * finalized sub-aggregates.
    */
  final case class PlannedAgg(
      name: String,
      states: Seq[(String, AggSplit)],
      buildFinal: Seq[Column] => Column,
      // hidden aggs keep the state machinery alive for aggregate-free CVs
      // (SELECT DISTINCT desugars to pure grouping — the matrel stores only
      // keys plus this invisible row counter) without surfacing in the
      // overlay's output columns
      hidden: Boolean = false)

  object PlannedAgg {
    def simple(name: String, split: AggSplit): PlannedAgg =
      PlannedAgg(name, Seq(s"__state_$name" -> split), cols => split.finalizer(cols.head))
  }

  final case class CvPlan(
      name: String,
      childPlan: LogicalPlan,
      streamLeaf: LocalRelation,
      keyNames: Seq[String],
      keyExprs: Seq[Column],
      aggs: Seq[PlannedAgg],
      sw: Option[SwSpec],
      options: CvOptions,
      limit: Option[Int] = None,
      // hidden grouping keys that never surface in the overlay — currently
      // only the grouping-set id (GROUP BY ROLLUP/CUBE/GROUPING SETS):
      // groups from different grouping sets must not merge even when their
      // visible key columns coincide (a rolled-up NULL vs a genuine NULL)
      hiddenKeys: Seq[(String, Column)] = Nil,
      // Append-only CV (no aggregates, no GROUP BY): the matrel stores one
      // row per event with a hidden arrival sequence, and LIMIT/OFFSET apply
      // at READ time in arrival order — cont_limit.sql keeps ALL 21 rows in
      // cqlimit_mrel and serves 9 of them (reference cont_view_namespace
      // .sql:61, stream_exprs.sql:2).
      append: Boolean = false,
      offset: Int = 0,
      appendOutputs: Seq[String] = Nil) {

    /** All state-table key columns (user keys + hidden keys + SW bucket). */
    def stateKeys: Seq[String] =
      keyNames ++ hiddenKeys.map(_._1) ++ sw.map(_.bucketCol).toSeq

    /** Distinct state columns in first-appearance order. Several outputs may
      * share one physical state (DISTINCT ON stores a single min-row struct
      * that every output column projects a field of), so the flattened
      * per-agg view is deduped by state name everywhere the matrel schema
      * is built.
      */
    def stateSplits: Seq[(String, AggSplit)] =
      aggs.flatMap(_.states).distinctBy(_._1)

    def reAggs: Seq[(String, Column => Column)] =
      stateSplits.map { case (n, sp) => n -> sp.reAgg }

    /** Bind the worker plan to a concrete micro-batch DataFrame. */
    def bindBatch(spark: SparkSession, batch: DataFrame): DataFrame =
      CvPlanner.bindStreamLeaf(spark, childPlan, streamLeaf, batch)

    /** Worker aggregation: micro-batch → one row per touched group with
      * partial state columns (AGGSPLIT_INITIAL_SERIAL analogue).
      */
    /** Aliased state-key columns over the bound child plan. Built from
      * resolved expressions (not name lookups): an Expand child (grouping
      * sets) re-emits grouping columns under their original names, so
      * by-name resolution would be ambiguous.
      */
    private def stateKeyCols(df: DataFrame): Seq[Column] =
      keyNames.zip(keyExprs).map { case (n, e) => e.as(n) } ++
        hiddenKeys.map { case (n, e) => e.as(n) } ++
        sw.map(s => dateRound(df(s.tsColumn), s.stepSeconds).as(s.bucketCol))

    /** Append-mode worker: the bound child plan IS the output (its Project
      * already carries the visible columns plus, for SW CVs, the hidden raw
      * timestamp). No aggregation, no shuffle — a map-only batch.
      */
    def workerRows(spark: SparkSession, batch: DataFrame): DataFrame = {
      require(append, s"$name is not an append-only continuous view")
      bindBatch(spark, batch)
    }

    /** combine-kind / SW metadata for one state column (empty if none). */
    def stateMetadata(sp: AggSplit): org.apache.spark.sql.types.Metadata = {
      val mb = new org.apache.spark.sql.types.MetadataBuilder()
      if (sp.kind.nonEmpty) mb.putString(CvPlanner.CombineKindKey, sp.kind)
      sw.foreach { s =>
        mb.putString(CvPlanner.SwBucketKey, s.bucketCol)
        mb.putLong(CvPlanner.SwWindowKey, s.windowSeconds)
      }
      mb.build()
    }

    /** Re-stamp state-column metadata onto a frame already shaped like the
      * state table (keys + state columns under internal names). Direct
      * matrel DML feeds user frames with NO column metadata into the store;
      * written as-is they'd strip the combine-kind from the state table and
      * SQL combine()/sw_combine()/finalize over `<cv>_mrel` would throw
      * until the next stream batch re-stamped it.
      */
    def stampStateMetadata(df: DataFrame): DataFrame = {
      val byName = stateSplits.toMap
      df.select(df.columns.toSeq.map { c =>
        byName.get(c).map(stateMetadata) match {
          case Some(md) if md != org.apache.spark.sql.types.Metadata.empty =>
            col(c).as(c, md)
          case _ => col(c)
        }
      }: _*)
    }

    def workerPartials(spark: SparkSession, batch: DataFrame): DataFrame = {
      val df = bindBatch(spark, batch)
      // each state column carries its combine-kind as metadata, so any later
      // reader of the state table can resolve combine() on the bare column;
      // SW CVs additionally carry the window spec for SQL sw_combine()
      val stateCols = stateSplits.map { case (n, sp) =>
        val md = stateMetadata(sp)
        if (md == org.apache.spark.sql.types.Metadata.empty) sp.partial.as(n)
        else sp.partial.as(n, md)
      }
      df.groupBy(stateKeyCols(df): _*).agg(stateCols.head, stateCols.tail: _*)
    }

    /** Output columns the overlay exposes (hidden aggs stay internal). */
    def visibleAggs: Seq[PlannedAgg] = aggs.filterNot(_.hidden)

    /** Finalize columns over a state DataFrame (user-visible outputs). */
    def finalizeCols: Seq[Column] =
      visibleAggs.map(a => a.buildFinal(a.states.map(st => col(st._1))).as(a.name))

    /** Finalize columns including hidden aggs — the changes emitter keeps
      * them so a pure-DISTINCT CV's old/new structs are never empty.
      */
    def finalizeColsAll: Seq[Column] =
      aggs.map(a => a.buildFinal(a.states.map(st => col(st._1))).as(a.name))

    /** All state column names (the matrel schema minus keys). */
    def stateNames: Seq[String] = stateSplits.map(_._1)

    /** (stateColumn, deltaFieldName) pairs for the output stream's delta
      * struct: a state owned by exactly one single-state agg surfaces under
      * that agg's output name (`(delta).n` — delta_streams.sql:7-21);
      * multi-state decompositions and shared states (DISTINCT ON's row
      * struct) surface under the stripped state name, each state exactly
      * once.
      */
    def deltaFields: Seq[(String, String)] = {
      val owned = singleOwnedStates
      stateSplits.map { case (n, _) =>
        owned.get(n) match {
          case Some(plain) => n -> plain
          case _ => n -> n.stripPrefix("__state_")
        }
      }
    }

    /** State column → output name of the aggregate that solely owns it
      * (single-state aggs only). THE naming authority shared by the delta
      * struct, the `_mrel` SQL binding, and matrel DML addressing — one
      * computation so the three surfaces can't drift apart.
      */
    def singleOwnedStates: Map[String, String] = {
      val owners = aggs.filter(_.states.sizeIs == 1).groupBy(_.states.head._1)
      stateSplits.flatMap { case (n, _) =>
        owners.get(n) match {
          case Some(Seq(a)) => Some(n -> a.name)
          case _ => None
        }
      }.toMap
    }
  }

  /** Substitute the stream's empty LocalRelation leaf with the micro-batch
    * plan, matching columns by name with casts and preserving the leaf's
    * exprIds so the rest of the analyzed tree stays resolved.
    */
  def bindStreamLeaf(spark: SparkSession, plan: LogicalPlan,
      streamLeaf: LocalRelation, batch: DataFrame): DataFrame = {
    val batchPlan = GraftBridge.analyzed(batch)
    val byName = batchPlan.output.map(a => a.name -> a).toMap
    val bound = plan.transformUp {
      case lr: LocalRelation if lr.output.map(_.exprId) == streamLeaf.output.map(_.exprId) =>
        Project(
          streamLeaf.output.map { exp =>
            val act = byName.getOrElse(exp.name,
              throw new IllegalArgumentException(s"batch missing stream column ${exp.name}"))
            Alias(org.apache.spark.sql.catalyst.expressions.Cast(act, exp.dataType), exp.name)(
              exprId = exp.exprId)
          },
          batchPlan)
    }
    GraftBridge.ofRows(spark, bound)
  }

  /** A continuous transform's plan: the full stateless SELECT over the
    * stream (projections/filters/stream–table joins), no aggregation
    * (reference DefineContTransform, pipeline_query.c:984).
    */
  final case class CtPlan(
      name: String,
      plan: LogicalPlan,
      streamLeaf: LocalRelation) {
    def bindBatch(spark: SparkSession, batch: DataFrame): DataFrame =
      CvPlanner.bindStreamLeaf(spark, plan, streamLeaf, batch)
  }

  /** Plan a continuous transform: same restriction wall minus the
    * must-aggregate rule (transforms must NOT aggregate).
    */
  def planTransform(spark: SparkSession, name: String, selectSql: String,
      streamLeafIds: Seq[Seq[org.apache.spark.sql.catalyst.expressions.ExprId]] = Nil): CtPlan = {
    rejectWildcards(spark, selectSql)
    val analyzed = stripViews(GraftBridge.analyzed(spark.sql(selectSql)))
    validate(analyzed)
    analyzed.foreach {
      case _: Aggregate => throw new IllegalArgumentException(
        "continuous transforms are stateless; use a continuous view to aggregate")
      case _ => ()
    }
    val leaves = analyzed.collect { case lr: LocalRelation => lr }
    val isStream: LocalRelation => Boolean =
      if (streamLeafIds.isEmpty) (_ => true)
      else lr => streamLeafIds.contains(lr.output.map(_.exprId))
    val streamLeaves = leaves.filter(isStream)
    require(streamLeaves.length == 1,
      if (streamLeaves.isEmpty) "continuous transforms must read exactly one stream"
      else "stream-stream JOINs are not supported in continuous transforms")
    CtPlan(name, analyzed, streamLeaves.head)
  }

  /** date_round(ts, step): floor a timestamp to an arbitrary second interval
    * (reference miscutils.c:305-331 — THE sliding-window bucketing primitive).
    */
  def dateRound(ts: Column, stepSeconds: Long): Column =
    org.apache.spark.sql.functions.timestamp_seconds(
      org.apache.spark.sql.functions.floor(ts.cast("double") / stepSeconds) * stepSeconds)

  /** '30 minutes' / '7 days' / '1 h' → seconds — THE interval-string parser
    * (sw, ttl, and date_round text arguments all route here; a unit added
    * in one place must not diverge from the others).
    */
  def intervalSeconds(spec: String): Long = {
    val m = """(?i)\s*(\d+)\s*(second|sec|s|minute|min|m|hour|h|day|d|week|w)s?\s*""".r
    spec match {
      case m(n, unit) =>
        val mult = unit.toLowerCase match {
          case "second" | "sec" | "s" => 1L
          case "minute" | "min" | "m" => 60L
          case "hour" | "h" => 3600L
          case "day" | "d" => 86400L
          case "week" | "w" => 604800L
        }
        n.toLong * mult
      case _ => throw new IllegalArgumentException(s"cannot parse interval: '$spec'")
    }
  }
  private def parseIntervalSeconds(spec: String): Long = intervalSeconds(spec)

  /** Plan a CV from its SELECT text. The stream must already be registered
    * as a temp view with the stream's schema (empty LocalRelation).
    */
  /** SELECT * (and t.*) is rejected in continuous queries before analysis
    * (analyze_cont_view.sql:42-48: "can't select \"*\" in continuous
    * queries") — Spark would silently expand the star against the stream
    * registration, freezing whichever columns existed at creation; the
    * reference makes the user state them. count(*) is untouched: its star
    * sits under a function, not in the select list.
    */
  private def rejectWildcards(spark: SparkSession, selectSql: String): Unit = {
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAlias, UnresolvedStar}
    def spell(s: UnresolvedStar): String =
      s.target.map(_.mkString(".") + ".*").getOrElse("*")
    def check(exprs: Seq[Expression]): Unit = exprs.foreach {
      case s: UnresolvedStar => throw new IllegalArgumentException(
        s"""cannot select "${spell(s)}" in continuous queries; """ +
          "explicitly state the columns to select")
      case UnresolvedAlias(s: UnresolvedStar, _) => throw new IllegalArgumentException(
        s"""cannot select "${spell(s)}" in continuous queries; """ +
          "explicitly state the columns to select")
      case _ => ()
    }
    spark.sessionState.sqlParser.parsePlan(selectSql).foreach {
      case p: Project => check(p.projectList)
      case a: Aggregate => check(a.aggregateExpressions)
      case _ => ()
    }
  }

  def plan(spark: SparkSession, name: String, selectSql: String,
      options: CvOptions = CvOptions(),
      streamLeafIds: Seq[Seq[org.apache.spark.sql.catalyst.expressions.ExprId]] = Nil): CvPlan = {
    rejectWildcards(spark, selectSql)
    val analyzed = stripViews(GraftBridge.analyzed(spark.sql(selectSql)))
    validate(analyzed)

    // No aggregate, no DISTINCT [ON], no GROUP BY anywhere → an APPEND-ONLY
    // CV: one matrel row per event (reference cont_view_namespace.sql:61,
    // stream_exprs.sql:2, cont_limit.sql). Grouped/distinct shapes keep the
    // keyed state machinery below.
    val hasAggShape = analyzed.exists {
      case _: Aggregate | _: Distinct => true
      case p: Project => p.projectList.headOption.exists(_.name.startsWith(DonKeyPrefix))
      case _ => false
    }
    if (!hasAggShape)
      return planAppend(spark, name, analyzed, options, streamLeafIds)

    val (shape, limitOpt) = findAggregate(analyzed)
    val agg = shape match {
      case a: Aggregate => a
      case pr: Project =>
        rejectNestedAggregates(pr.child)
        return planDistinctOn(spark, name, pr, options, streamLeafIds, limitOpt)
    }
    rejectNestedAggregates(agg.child)

    val streamLeaf = findStreamLeaf(agg.child, streamLeafIds)

    // group keys: named output columns whose expression is a grouping expr,
    // plus (for GROUPING SETS / ROLLUP / CUBE) outputs derived purely from
    // grouping columns — e.g. grouping(a)*2+grouping(b) AS gid — which are
    // functionally dependent on the grouping and so safely join the key set
    val groupingSet = agg.groupingExpressions.map(_.canonicalized).toSet
    // only bare grouping ATTRIBUTES license derived keys (references of a
    // composite grouping expr like x%2 do NOT determine the group)
    val groupingAttrIds = agg.groupingExpressions
      .collect { case a: Attribute => a.exprId }.toSet
    def isDerivedKey(e: Expression): Boolean =
      !e.exists(_.isInstanceOf[AggregateExpression]) &&
        e.references.nonEmpty && e.references.forall(a => groupingAttrIds.contains(a.exprId))
    val keyOutputs = agg.aggregateExpressions.filter {
      case a: Alias => groupingSet.contains(a.child.canonicalized) || isDerivedKey(a.child)
      case a: Attribute => groupingSet.contains(a.canonicalized)
      case _ => false
    }
    // every grouping expression must surface as an output column — the state
    // table is keyed by the output keys, so a hidden grouping key would
    // silently change the aggregation grain. Sole exception: Catalyst's
    // internal grouping-set id, which we key by invisibly (rolled-up NULLs
    // must not merge with genuine NULL groups — cont_grouping_sets.sql).
    val coveredGroupings = keyOutputs.map {
      case a: Alias => a.child.canonicalized
      case a: Attribute => a.canonicalized
    }.toSet
    val uncovered = agg.groupingExpressions
      .filterNot(g => coveredGroupings.contains(g.canonicalized))
    val (groupingIdKeys, missing) = uncovered.partition {
      case a: Attribute =>
        a.name == org.apache.spark.sql.catalyst.expressions.VirtualColumn.groupingIdName
      case _ => false
    }
    require(missing.isEmpty,
      "every GROUP BY expression must appear in the continuous view's select list")
    val hiddenKeys = groupingIdKeys.zipWithIndex.map { case (e, i) =>
      s"__grouping_id$i" -> GraftBridge.column(e)
    }

    val keyNames = keyOutputs.map(_.name)
    val keyExprs = keyOutputs.map {
      case a: Alias => GraftBridge.column(a.child)
      case a: Attribute => GraftBridge.column(a)
    }

    // aggregates: remaining select items — either a plain aggregate or a
    // scalar expression over aggregates (sum(x)/count(*), count(*)+1,
    // combinable_rank(...)): each contained aggregate becomes a state
    // column and the scalar shell is rebuilt over the finalized values.
    val planned = agg.aggregateExpressions.filterNot(keyOutputs.contains).map {
      case a: Alias =>
        import org.apache.spark.sql.catalyst.expressions.{Literal, Slice, SortArray}
        a.child match {
          case ae: AggregateExpression => PlannedAgg.simple(a.name, splitOf(ae))
          // first_values(n, x) expands to slice(sort_array(collect_list(x)), 1, n);
          // decomposing it as a generic scalar-over-aggregate would store the
          // UNBOUNDED collect_list per group — recognize the shape and use the
          // capped mergeable split (top-n state per group, firstvalues.c)
          case Slice(SortArray(ae: AggregateExpression, Literal(true, _)),
              Literal(1, _), Literal(n: Int, _))
              if ae.aggregateFunction.isInstanceOf[CollectList] && !ae.isDistinct =>
            PlannedAgg.simple(a.name, AggSplit.firstValues(
              GraftBridge.column(
                ae.aggregateFunction.asInstanceOf[CollectList].child), n)
              .withKind(s"first_values:$n"))
          case composite =>
            val aggExprs = {
              // distinct by canonical form, keeping first occurrence order
              val seen = mutable.LinkedHashMap.empty[Expression, AggregateExpression]
              composite.foreach {
                case ae: AggregateExpression =>
                  seen.getOrElseUpdate(ae.canonicalized, ae); ()
                case _ => ()
              }
              seen.values.toSeq
            }
            require(aggExprs.nonEmpty,
              s"unsupported select item in continuous view: ${a.sql} " +
                "(neither a group key nor an aggregate)")
            val states = aggExprs.zipWithIndex.map { case (ae, i) =>
              (s"__state_${a.name}_$i", splitOf(ae))
            }
            val byCanon = aggExprs.map(_.canonicalized).zipWithIndex.toMap
            val buildFinal: Seq[Column] => Column = { stateCols =>
              val finals = states.zip(stateCols).map { case ((_, sp), c) =>
                GraftBridge.expression(sp.finalizer(c))
              }
              GraftBridge.column(composite.transformUp {
                case ae: AggregateExpression => finals(byCanon(ae.canonicalized))
              })
            }
            PlannedAgg(a.name, states, buildFinal)
        }
      case other =>
        throw new IllegalArgumentException(
          s"unsupported select item in continuous view: ${other.sql}")
    }
    // SELECT DISTINCT desugars to an aggregate-free grouping (reference
    // analyzer.c:2605-2624): the matrel stores one row per distinct tuple.
    // A hidden row counter keeps the state/merge machinery uniform without
    // surfacing in the overlay.
    val plannedOrExists =
      if (planned.nonEmpty) planned
      else {
        require(keyOutputs.nonEmpty,
          "continuous views must contain at least one aggregate or DISTINCT output")
        Seq(PlannedAgg("__exists",
          Seq("__state___exists" -> AggSplit.count(None).withKind("count")),
          cols => AggSplit.count(None).finalizer(cols.head),
          hidden = true))
      }

    val sw = options.sw.map { w =>
      // step_factor range check (reference analyzer.c:1705-1729 +
      // config.c:333-340: sliding_window_step_factor clamps to 0–50) — an
      // out-of-range factor would silently yield one bucket per window,
      // which defeats read-time expiry entirely.
      require(options.stepFactor > 0 && options.stepFactor <= 50,
        s"step_factor must be in (0, 50] (got ${options.stepFactor})")
      val winSec = parseIntervalSeconds(w)
      val stepSec = math.max(1L, (winSec * options.stepFactor / 100.0).toLong)
      require(stepSec < winSec,
        s"sliding window '$w' is too narrow for step_factor ${options.stepFactor}: " +
          "the whole window rounds to a single step bucket")
      SwSpec(winSec, stepSec, options.swColumn)
    }

    CvPlan(name, agg.child, streamLeaf, keyNames, keyExprs, plannedOrExists, sw, options,
      limitOpt, hiddenKeys = hiddenKeys)
  }

  /** The LocalRelation leaf backing a registered stream (other leaves are
    * static in-memory dims); exactly one per CQ (analyzer.c:1264-1274).
    */
  private def findStreamLeaf(child: LogicalPlan,
      streamLeafIds: Seq[Seq[org.apache.spark.sql.catalyst.expressions.ExprId]]): LocalRelation = {
    val leaves = child.collect { case lr: LocalRelation => lr }
    val isStream: LocalRelation => Boolean =
      if (streamLeafIds.isEmpty) (_ => true)
      else lr => streamLeafIds.contains(lr.output.map(_.exprId))
    val streamLeaves = leaves.filter(isStream)
    require(streamLeaves.length == 1,
      if (streamLeaves.isEmpty) "continuous views must read exactly one stream (none found)"
      else "stream-stream JOINs are not supported in continuous views") // analyzer.c:1264-1274
    streamLeaves.head
  }

  /** Internal alias prefix marking the desugared DISTINCT ON key exprs. */
  private[cv] val DonKeyPrefix = "__don_key_"

  /** `SELECT DISTINCT ON (e1, …) o1, … FROM …` → `SELECT (e1) AS __don_key_0,
    * …, o1, … FROM …` — Spark's parser has no DISTINCT ON, so the ON exprs
    * are spliced in as marked leading outputs before analysis (the
    * reference makes DISTINCT ON explicit into grouping the same way,
    * analyzer.c:2605-2624; cont_distinct.sql:62-106). Purely textual like
    * [[desugarSwPredicate]]; the desugared form is what persists.
    */
  private val DistinctOnRe = """(?is)^(\s*SELECT\s+)DISTINCT\s+ON\s*\(""".r

  def desugarDistinctOn(selectSql: String): String =
    DistinctOnRe.findFirstMatchIn(selectSql) match {
      case None => selectSql
      case Some(m) =>
        // find the ON list's matching close paren — skipping parens inside
        // string literals ('' is the SQL escape for a quote), which would
        // otherwise miscount depth and splice mangled SQL
        var depth = 1
        var i = m.end
        var inStr = false
        while (depth > 0 && i < selectSql.length) {
          selectSql.charAt(i) match {
            case '\'' => inStr = !inStr // '' toggles twice: net no-op, correct
            case '(' if !inStr => depth += 1
            case ')' if !inStr => depth -= 1
            case _ => ()
          }
          i += 1
        }
        require(depth == 0, s"unbalanced parentheses in DISTINCT ON: $selectSql")
        val onList = selectSql.substring(m.end, i - 1)
        // split the ON list on top-level commas (same literal-awareness)
        val exprs = mutable.Buffer.empty[String]
        var d = 0; var start = 0; var inS = false
        onList.zipWithIndex.foreach { case (ch, j) =>
          ch match {
            case '\'' => inS = !inS
            case '(' if !inS => d += 1
            case ')' if !inS => d -= 1
            case ',' if d == 0 && !inS =>
              exprs += onList.substring(start, j); start = j + 1
            case _ => ()
          }
        }
        exprs += onList.substring(start)
        val keyed = exprs.zipWithIndex
          .map { case (e, k) => s"(${e.trim}) AS $DonKeyPrefix$k" }.mkString(", ")
        m.group(1) + keyed + ", " + selectSql.substring(i)
    }

  /** Plan a desugared DISTINCT ON: the ON exprs key the state invisibly;
    * the output columns share ONE min-of-row-struct state, so all of them
    * come from the same surviving row. PG leaves the representative row
    * unpredictable without ORDER BY; we refine that to the deterministic
    * lexicographic minimum (by output order, NULLS FIRST) so results are
    * stable under parallel merge.
    */
  private def planDistinctOn(spark: SparkSession, name: String, proj: Project,
      options: CvOptions,
      streamLeafIds: Seq[Seq[org.apache.spark.sql.catalyst.expressions.ExprId]],
      limitOpt: Option[Int]): CvPlan = {
    val (donKeys, rest) = proj.projectList.partition(_.name.startsWith(DonKeyPrefix))
    require(rest.nonEmpty, "DISTINCT ON requires at least one output column")
    def colOf(ne: org.apache.spark.sql.catalyst.expressions.NamedExpression): Column = ne match {
      case a: Alias => GraftBridge.column(a.child)
      case a: Attribute => GraftBridge.column(a)
    }
    val hiddenKeys = donKeys.map(k => k.name -> colOf(k))
    val rowStruct = org.apache.spark.sql.functions.struct(
      rest.zipWithIndex.map { case (o, i) => colOf(o).as(s"c$i") }: _*)
    // min over the struct: both merge-associative and deterministic; kind
    // "min" lets SQL combine() over the stored column keep merging it
    val split = AggSplit(
      org.apache.spark.sql.functions.min(rowStruct),
      s => org.apache.spark.sql.functions.min(s), identity).withKind("min")
    val stateName = "__state___don_row"
    val planned = rest.zipWithIndex.map { case (o, i) =>
      PlannedAgg(o.name, Seq(stateName -> split), cols => cols.head.getField(s"c$i"))
    }
    val sw = options.sw.map { w =>
      require(options.stepFactor > 0 && options.stepFactor <= 50,
        s"step_factor must be in (0, 50] (got ${options.stepFactor})")
      val winSec = intervalSeconds(w)
      val stepSec = math.max(1L, (winSec * options.stepFactor / 100.0).toLong)
      require(stepSec < winSec,
        s"sliding window '$w' is too narrow for step_factor ${options.stepFactor}")
      SwSpec(winSec, stepSec, options.swColumn)
    }
    CvPlan(name, proj.child, findStreamLeaf(proj.child, streamLeafIds),
      keyNames = Nil, keyExprs = Nil, planned, sw, options, limitOpt,
      hiddenKeys = hiddenKeys)
  }

  /** Plan an append-only CV: `SELECT <exprs> FROM stream [WHERE …]
    * [LIMIT n [OFFSET m]]` with no aggregation. Every event appends one
    * matrel row (the reference's non-aggregating CVs — analyzer.c treats
    * them as a projection CQ with a `$pk` arrival sequence); LIMIT/OFFSET
    * are READ-time in arrival order (cont_limit.sql stores all rows).
    * For sliding windows the raw timestamp is stored in a hidden column
    * and filtered exactly at read time.
    */
  private def planAppend(spark: SparkSession, name: String, analyzed: LogicalPlan,
      options: CvOptions,
      streamLeafIds: Seq[Seq[org.apache.spark.sql.catalyst.expressions.ExprId]]): CvPlan = {
    var limit: Option[Int] = None
    var offset = 0
    def strip(p: LogicalPlan): LogicalPlan = p match {
      case GlobalLimit(l, child) =>
        limit = Some(l.eval(null).toString.toInt); strip(child)
      case LocalLimit(_, child) => strip(child)
      case o: Offset =>
        offset = o.offsetExpr.eval(null).toString.toInt; strip(o.child)
      case other => other
    }
    val base = strip(analyzed) match {
      case p: Project => p
      case other => Project(other.output, other) // bare scan: SELECT * collapse
    }
    val outNames = base.projectList.map(_.name)
    require(outNames.distinct.size == outNames.size,
      s"duplicate output column in continuous view $name: " +
        outNames.diff(outNames.distinct).distinct.mkString(", "))
    require(!outNames.exists(_.startsWith("__")),
      "continuous view output columns must not start with '__' (reserved)")
    val sw = options.sw.map { w =>
      require(options.stepFactor > 0 && options.stepFactor <= 50,
        s"step_factor must be in (0, 50] (got ${options.stepFactor})")
      val winSec = intervalSeconds(w)
      val stepSec = math.max(1L, (winSec * options.stepFactor / 100.0).toLong)
      SwSpec(winSec, stepSec, options.swColumn)
    }
    // SW CVs store the raw timestamp invisibly: the sw column need not be a
    // visible output, so it rides the child Project under a reserved alias
    val child = sw match {
      case None => base
      case Some(s) =>
        val tsAttr = base.child.output.find(_.name.equalsIgnoreCase(s.tsColumn))
          .getOrElse(throw new IllegalArgumentException(
            s"sliding-window column '${s.tsColumn}' is not a column of the stream"))
        Project(base.projectList :+ Alias(tsAttr, AppendSwTs)(), base.child)
    }
    options.ttlColumn.foreach { tc =>
      require(outNames.contains(tc),
        s"ttl_column '$tc' is not an output column of continuous view $name")
    }
    CvPlan(name, child, findStreamLeaf(child, streamLeafIds),
      keyNames = Nil, keyExprs = Nil, aggs = Nil, sw = sw, options = options,
      limit = limit, hiddenKeys = Nil,
      append = true, offset = offset, appendOutputs = outNames)
  }

  /** Temp-view wrappers are pure metadata (the optimizer's EliminateView
    * drops them too); stripping them up front lets bindStreamLeaf substitute
    * the stream leaf without tripping View's child-output invariant (a
    * cast-for-coercion projection changes attribute nullability).
    */
  private def stripViews(plan: LogicalPlan): LogicalPlan =
    plan.transformUp { case v: View => v.child }

  /** Subselects below the CV's aggregate may project, filter, join dims, and
    * unroll (explode/Generate) — but must not themselves aggregate: an inner
    * aggregation would run per micro-batch over partial data and silently
    * change meaning (the reference rejects it the same way —
    * cont_subselect.sql:1-58, analyzer.c:1183-1344).
    */
  private def rejectNestedAggregates(child: LogicalPlan): Unit =
    child.foreach {
      case _: Aggregate | _: Distinct =>
        throw new IllegalArgumentException(
          "aggregates in subselects are not supported in continuous views")
      case _ => ()
    }

  private def namedOutputs(p: LogicalPlan): Seq[Expression] = p match {
    case pr: Project => pr.projectList
    case a: Aggregate => a.aggregateExpressions
    case _ => Nil
  }

  /** The restriction wall (analyzer.c:1183-1344). */
  private def validate(plan: LogicalPlan): Unit = {
    plan.foreach {
      case _: Sort =>
        throw new IllegalArgumentException("ORDER BY is not supported in continuous views")
      case f: Filter if f.child.isInstanceOf[Aggregate] =>
        throw new IllegalArgumentException("HAVING is not supported in continuous views")
      case _: Window =>
        throw new IllegalArgumentException("window functions are not supported in continuous views")
      case p if p.expressions.exists(_.exists(_.isInstanceOf[WindowExpression])) =>
        throw new IllegalArgumentException("window functions are not supported in continuous views")
      // scalar subselects in the target list re-evaluate a table per event
      // and have no incremental state (create_cont_view.sql: "Subselects
      // aren't allowed in a CV's target list")
      case p @ (_: Project | _: Aggregate) if p.expressions.exists(_.exists(
          _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.ScalarSubquery])) =>
        throw new IllegalArgumentException(
          "subselects are not allowed in a continuous view's target list")
      // the implicit arrival column must stay addressable (create_cont_view
      // .sql: "arrival_timestamp is reserved") — aliasing something ELSE to
      // the name would shadow it; the identity alias is allowed, like the
      // reference
      case p @ (_: Project | _: Aggregate) if namedOutputs(p).exists {
          case a: org.apache.spark.sql.catalyst.expressions.Alias
              if a.name.equalsIgnoreCase("arrival_timestamp") =>
            a.child match {
              case attr: Attribute => !attr.name.equalsIgnoreCase("arrival_timestamp")
              case _ => true
            }
          case _ => false
        } =>
        throw new IllegalArgumentException(
          "arrival_timestamp is a reserved column name in continuous views")
      case _ => ()
    }
  }

  /** Unwrap Project/LIMIT layers above the Aggregate. LIMIT n acts as a cap
    * on total rows materialized (cont_limit.sql:1-16 — hoisted into the
    * worker in the reference). `SELECT DISTINCT` analyzes to a Distinct
    * node — made explicit into grouping exactly like the reference
    * (analyzer.c:2605-2624): group by every output, no aggregates.
    * A Project whose leading outputs are `__don_key_` aliases is the
    * desugared `SELECT DISTINCT ON (…)` form (see [[desugarDistinctOn]]).
    */
  private def findAggregate(plan: LogicalPlan): (LogicalPlan, Option[Int]) = {
    def loop(p: LogicalPlan, limit: Option[Int]): (LogicalPlan, Option[Int]) = p match {
      case a: Aggregate => (a, limit)
      case d: Distinct =>
        (Aggregate(d.child.output, d.child.output, d.child), limit)
      case GlobalLimit(lim, child) =>
        loop(child, Some(lim.eval(null).toString.toInt))
      case LocalLimit(_, child) => loop(child, limit)
      case pr: Project if pr.projectList.headOption.exists(_.name.startsWith(DonKeyPrefix)) =>
        (pr, limit)
      case pr: Project => loop(pr.child, limit)
      case other => throw new IllegalArgumentException(
        s"continuous views must aggregate; got ${other.nodeName} " +
          "(use a continuous transform for stateless queries)")
    }
    loop(plan, None)
  }

  /** Map a Catalyst AggregateExpression onto our 3-way split — the
    * counterpart of the reference's `GetCombineAggs` catalog lookup
    * (analyzer.c:4282-4446).
    */
  private def splitOf(ae0: AggregateExpression): AggSplit = {
    // agg(...) FILTER (WHERE p): rewrite each data input to If(p, input,
    // NULL) and dispatch on the unfiltered shape — every split below (and
    // every sketch buffer) ignores NULL inputs, so the state aggregates
    // exactly the filtered rows (the reference keeps PG's filtered
    // aggregates combinable; cont_hs_agg.sql's hypothetical-set shapes are
    // count(*) FILTER underneath). Literal parameters (percentile
    // fractions, string_agg delimiters) stay foldable; when every child is
    // foldable — count(*), sum(1) — the first is wrapped so the predicate
    // still reaches the row stream.
    val ae = ae0.filter match {
      case None => ae0
      case Some(p) =>
        import org.apache.spark.sql.catalyst.expressions.{If => IfExpr, Literal}
        val f = ae0.aggregateFunction
        val anyData = f.children.exists(!_.foldable)
        val newKids = f.children.zipWithIndex.map { case (ch, i) =>
          if (!ch.foldable || (!anyData && i == 0))
            IfExpr(p, ch, Literal.create(null, ch.dataType))
          else ch
        }
        ae0.copy(
          aggregateFunction = f.withNewChildren(newKids)
            .asInstanceOf[org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction],
          filter = None)
    }
    def c(e: Expression): Column = GraftBridge.column(e)
    ae.aggregateFunction match {
      case f: Count if ae.isDistinct =>
        // count(DISTINCT x) → hll_count_distinct (analyzer.c:91-106)
        AggSplit.hllCountDistinct(c(f.children.head)).withKind("hll_count_distinct")
      case _ if ae.isDistinct && !ae.aggregateFunction.isInstanceOf[CollectSet] =>
        throw new IllegalArgumentException(
          s"DISTINCT is only supported for count()/set_agg in continuous views " +
            s"(got ${ae.aggregateFunction.prettyName})") // analyzer.c:1306-1317
      case f: Count =>
        AggSplit.count(f.children.headOption
          .filterNot(_.foldable) // count(*) arrives as count(1): state is just a row count
          .map(e => c(e))).withKind("count")
      case f: Sum => AggSplit.sumOf(c(f.child)).withKind("sum")
      case f: Min => AggSplit.minOf(c(f.child)).withKind("min")
      case f: Max => AggSplit.maxOf(c(f.child)).withKind("max")
      case f: Average =>
        // decimal/interval inputs keep their own sum type in the state
        // (full precision / interval semantics); floats use the float8-
        // style double state like the reference (sql:142-225)
        import org.apache.spark.sql.types.{DayTimeIntervalType, DecimalType, YearMonthIntervalType}
        val exact = f.child.dataType match {
          case _: DecimalType | _: DayTimeIntervalType | _: YearMonthIntervalType => true
          case _ => false
        }
        (if (exact) AggSplit.avgExactOf(c(f.child)) else AggSplit.avgOf(c(f.child)))
          .withKind("avg")
      case f: VarianceSamp => AggSplit.varSamp(c(f.child)).withKind("var_samp")
      case f: VariancePop => AggSplit.varPop(c(f.child)).withKind("var_pop")
      case f: StddevSamp => AggSplit.stddevSamp(c(f.child)).withKind("stddev_samp")
      case f: StddevPop => AggSplit.stddevPop(c(f.child)).withKind("stddev_pop")
      case f: Corr => AggSplit.corrOf(c(f.y), c(f.x)).withKind("corr")
      case f: CovPopulation => AggSplit.covarPop(c(f.left), c(f.right)).withKind("covar_pop")
      case f: CovSample => AggSplit.covarSamp(c(f.left), c(f.right)).withKind("covar_samp")
      case f: RegrCount =>
        AggSplit.regrCount(c(f.children(0)), c(f.children(1))).withKind("regr_count")
      case f: RegrAvgX =>
        AggSplit.regrAvgX(c(f.children(0)), c(f.children(1))).withKind("regr_avgx")
      case f: RegrAvgY =>
        AggSplit.regrAvgY(c(f.children(0)), c(f.children(1))).withKind("regr_avgy")
      case f: RegrSXX =>
        AggSplit.regrSXX(c(f.children(0)), c(f.children(1))).withKind("regr_sxx")
      case f: RegrSYY =>
        AggSplit.regrSYY(c(f.children(0)), c(f.children(1))).withKind("regr_syy")
      case f: RegrSXY =>
        AggSplit.regrSXY(c(f.children(0)), c(f.children(1))).withKind("regr_sxy")
      case f: RegrSlope =>
        AggSplit.regrSlope(c(f.children(0)), c(f.children(1))).withKind("regr_slope")
      case f: RegrIntercept =>
        AggSplit.regrIntercept(c(f.children(0)), c(f.children(1))).withKind("regr_intercept")
      case f: RegrR2 =>
        AggSplit.regrR2(c(f.children(0)), c(f.children(1))).withKind("regr_r2")
      // bool_and/every, bool_or/any and bit_and/bit_or — PG built-ins the
      // reference keeps combinable (cont_bool_agg.sql)
      case f: BoolAnd => AggSplit.boolAnd(c(f.child)).withKind("bool_and")
      case f: BoolOr => AggSplit.boolOr(c(f.child)).withKind("bool_or")
      case f: BitAndAgg => AggSplit.bitAnd(c(f.child)).withKind("bit_and")
      case f: BitOrAgg => AggSplit.bitOr(c(f.child)).withKind("bit_or")
      case f: ListAgg =>
        val delim = f.delimiter.eval(null) match {
          case null => ""
          case s => s.toString
        }
        AggSplit.stringAgg(c(f.child), delim).withKind(s"string_agg:$delim")
      case f: CollectSet => AggSplit.setAgg(c(f.child)).withKind("set_agg")
      case f: CollectList => AggSplit.arrayAgg(c(f.child)).withKind("array_agg")
      case f: MaxBy =>
        AggSplit.keyedMax(c(f.orderingExpr), c(f.valueExpr)).withKind("keyed_max")
      case f: MinBy =>
        AggSplit.keyedMin(c(f.orderingExpr), c(f.valueExpr)).withKind("keyed_min")
      case f: graft.functions.HllAgg => AggSplit.hllAgg(c(f.child)).withKind("hll")
      // merge-aggregates over ALREADY-SERIALIZED states: a CV reading a
      // delta stream (FROM <cv>_osrel) re-aggregates the partial states in
      // (delta).col — partial AND merge are both the union/merge function
      case f: graft.functions.HllUnionAgg =>
        AggSplit(graft.functions.GraftFunctions.hll_union_agg(c(f.child)),
          s => graft.functions.GraftFunctions.hll_union_agg(s), identity).withKind("hll")
      case f: graft.functions.BloomUnionAgg =>
        AggSplit(graft.functions.GraftFunctions.bloom_union_agg(c(f.child)),
          s => graft.functions.GraftFunctions.bloom_union_agg(s), identity).withKind("bloom")
      case f: graft.functions.FreqMergeAgg =>
        AggSplit(graft.functions.GraftFunctions.freq_merge_agg(c(f.child)),
          s => graft.functions.GraftFunctions.freq_merge_agg(s), identity).withKind("freq")
      case f: graft.functions.DistMergeAgg =>
        AggSplit(graft.functions.GraftFunctions.dist_merge_agg(c(f.child)),
          s => graft.functions.GraftFunctions.dist_merge_agg(s), identity).withKind("dist")
      case f: graft.functions.TopKMergeAgg =>
        AggSplit(graft.functions.GraftFunctions.topk_merge_agg(c(f.child)),
          s => graft.functions.GraftFunctions.topk_merge_agg(s), identity).withKind("topk_merge")
      case f: graft.functions.HllCountDistinct =>
        AggSplit.hllCountDistinct(c(f.child)).withKind("hll_count_distinct")
      case f: graft.functions.BloomAgg => AggSplit.bloomAgg(c(f.child)).withKind("bloom")
      case f: graft.functions.FreqAgg => AggSplit.freqAgg(c(f.child)).withKind("freq")
      case f: graft.functions.DistAgg => AggSplit.distAgg(c(f.child)).withKind("dist")
      case f: graft.functions.TopKAgg =>
        AggSplit.topkAgg(c(f.child), f.k).withKind(s"topk:${f.k}")
      // first_values(n, x) in SQL analyzes to the bounded bottom-k aggregate
      case f: graft.functions.BottomKAgg =>
        AggSplit.firstValues(c(f.child), f.k).withKind(s"first_values:${f.k}")
      case f: Percentile =>
        def toD(v: Any): Double = v match {
          case d: Double => d
          case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
          case other => other.toString.toDouble
        }
        f.percentageExpression.eval(null) match {
          case arr: org.apache.spark.sql.catalyst.util.ArrayData =>
            val qs = arr.toObjectArray(org.apache.spark.sql.types.DoubleType).toSeq.map(toD)
            AggSplit.percentileContMulti(c(f.child), qs)
          case one =>
            val q = toD(one)
            AggSplit.percentileCont(c(f.child), q).withKind(s"percentile_cont:$q")
        }
      case other if customSplits.contains(other.prettyName.toLowerCase) =>
        customSplits(other.prettyName.toLowerCase)(ae)
      case other =>
        throw new IllegalArgumentException(
          s"aggregate '${other.prettyName}' has no streaming (combinable) variant yet")
    }
  }
}
