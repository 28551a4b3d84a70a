package graft.cv

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** The three-way aggregate split at the heart of the engine — the Spark
  * re-expression of the reference's worker-partial / combiner-combine /
  * overlay-finalize decomposition (/root/reference/src/planner.c:60-193,
  * analyzer.c:2762-3078):
  *
  *   - [[partial]]: aggregate Column computing the stored state from raw
  *     events (the matrel column — transition + serialize),
  *   - [[reAgg]]: aggregate Column merging many stored states into one
  *     (the combine function; used by the upsert merge, sliding-window
  *     overlay re-combines, and user-facing `combine()` re-grouping),
  *   - [[finalize]]: scalar Column turning a state into the user-facing
  *     value (the overlay view's finalize call).
  *
  * Laws (asserted in CvSpec): for any partition of rows R = R₁ ∪ … ∪ Rₙ,
  *   finalize(reAgg(partial(R₁), …, partial(Rₙ))) == direct_agg(R).
  */
final case class AggSplit(
    partial: Column,
    reAgg: Column => Column,
    finalizer: Column => Column,
    // serializable descriptor ("avg", "string_agg:,", "topk:3", …) stamped
    // into the state column's metadata so SQL-level combine() can rebuild
    // the merge+finalize pair from a bare stored column — the Spark-native
    // counterpart of the reference's pipelinedb.combine catalog lookup
    // (RewriteCombineAggs, analyzer.c:4446-4615)
    kind: String = "") {
  def withKind(k: String): AggSplit = copy(kind = k)
}

object AggSplit {

  // kind → split reconstruction for custom (user-registered) combinables,
  // consulted by resolve() after the built-in kinds
  private val customKinds =
    scala.collection.mutable.Map.empty[String, () => AggSplit]

  def registerKind(kind: String, mk: () => AggSplit): Unit =
    customKinds(kind) = mk

  /** Rebuild the (reAgg, finalizer) pair from a kind descriptor. The input
    * column is irrelevant — merge and finalize operate on stored state.
    */
  def resolve(kind: String): AggSplit = {
    val parts = kind.split(":", 2)
    val d = lit(null)
    parts(0) match {
      case "count" => count(None)
      case "sum" => sumOf(d)
      case "min" => minOf(d)
      case "max" => maxOf(d)
      case "avg" => avgOf(d)
      case "var_samp" => varSamp(d)
      case "var_pop" => varPop(d)
      case "stddev_samp" => stddevSamp(d)
      case "stddev_pop" => stddevPop(d)
      case "corr" => corrOf(d, d)
      case "covar_pop" => covarPop(d, d)
      case "covar_samp" => covarSamp(d, d)
      case "regr_count" => regrCount(d, d)
      case "regr_avgx" => regrAvgX(d, d)
      case "regr_avgy" => regrAvgY(d, d)
      case "regr_sxx" => regrSXX(d, d)
      case "regr_syy" => regrSYY(d, d)
      case "regr_sxy" => regrSXY(d, d)
      case "regr_slope" => regrSlope(d, d)
      case "regr_intercept" => regrIntercept(d, d)
      case "regr_r2" => regrR2(d, d)
      case "bool_and" => boolAnd(d)
      case "bool_or" => boolOr(d)
      case "bit_and" => bitAnd(d)
      case "bit_or" => bitOr(d)
      case "string_agg" => stringAgg(d, if (parts.length > 1) parts(1) else "")
      case "hll_count_distinct" => hllCountDistinct(d)
      case "hll" => hllAgg(d)
      case "bloom" => bloomAgg(d)
      case "freq" => freqAgg(d)
      case "dist" => distAgg(d)
      case "topk" => topkAgg(d, parts(1).toInt)
      case "topk_merge" => // merge-of-merges: k travels inside the state
        AggSplit(d, s => GraftFunctions.topk_merge_agg(s), identity, kind = "topk_merge")
      case "set_agg" => setAgg(d)
      case "array_agg" => arrayAgg(d)
      case "keyed_min" => keyedMin(d, d)
      case "keyed_max" => keyedMax(d, d)
      case "percentile_cont" => percentileCont(d, parts(1).toDouble)
      case "percentile_cont_multi" =>
        percentileContMulti(d, parts(1).split(",").toSeq.map(_.toDouble))
      case "first_values" => firstValues(d, parts(1).toInt)
      case other => customKinds.get(kind).map(_()).getOrElse(
        throw new IllegalArgumentException(
          s"combine(): unknown stored-state kind '$other'"))
    }
  }

  /** count(*) / count(x) → bigint state, merged by sum. */
  def count(c: Option[Column]): AggSplit = AggSplit(
    partial = c.map(org.apache.spark.sql.functions.count)
      .getOrElse(org.apache.spark.sql.functions.count(lit(1))),
    reAgg = s => sum(s),
    finalizer = s => coalesce(s, lit(0L)))

  def sumOf(c: Column): AggSplit =
    AggSplit(sum(c), s => sum(s), identity)

  def minOf(c: Column): AggSplit =
    AggSplit(min(c), s => min(s), identity)

  def maxOf(c: Column): AggSplit =
    AggSplit(max(c), s => max(s), identity)

  /** avg → {sum, cnt} struct state (reference: bigint[2]/float8[3] transition
    * arrays, pipelinedb--1.0.0.sql:142-225).
    */
  def avgOf(c: Column): AggSplit = AggSplit(
    partial = struct(
      sum(c.cast("double")).as("s"),
      org.apache.spark.sql.functions.count(c).as("n")),
    reAgg = st => struct(sum(st.getField("s")).as("s"), sum(st.getField("n")).as("n")),
    finalizer = st => st.getField("s") / st.getField("n"))

  /** avg keeping the input's own sum type in the state — DECIMAL stays at
    * full precision and day-time/year-month INTERVALs stay intervals
    * (reference avg(interval)/avg(numeric) keep their own transition arrays,
    * sql:142-225, where float inputs use the float8 state above). The merge
    * and finalize shapes are identical to [[avgOf]], so both share the
    * `avg` combine-kind.
    */
  def avgExactOf(c: Column): AggSplit = AggSplit(
    partial = struct(
      sum(c).as("s"),
      org.apache.spark.sql.functions.count(c).as("n")),
    reAgg = st => struct(sum(st.getField("s")).as("s"), sum(st.getField("n")).as("n")),
    finalizer = st => st.getField("s") / st.getField("n"))

  /** Variance family → {n, Σx, Σx²} state (sql:458-689). */
  private def momentsPartial(c: Column): Column = {
    val d = c.cast("double")
    struct(
      org.apache.spark.sql.functions.count(d).as("n"),
      sum(d).as("sx"),
      sum(d * d).as("sxx"))
  }
  private def momentsReAgg(st: Column): Column = struct(
    sum(st.getField("n")).as("n"),
    sum(st.getField("sx")).as("sx"),
    sum(st.getField("sxx")).as("sxx"))

  private def varPopExpr(st: Column): Column = {
    val n = st.getField("n"); val sx = st.getField("sx"); val sxx = st.getField("sxx")
    when(n > 0, (sxx - sx * sx / n) / n)
  }
  private def varSampExpr(st: Column): Column = {
    val n = st.getField("n"); val sx = st.getField("sx"); val sxx = st.getField("sxx")
    when(n > 1, (sxx - sx * sx / n) / (n - 1))
  }

  def varSamp(c: Column): AggSplit = AggSplit(momentsPartial(c), momentsReAgg, varSampExpr)
  def varPop(c: Column): AggSplit = AggSplit(momentsPartial(c), momentsReAgg, varPopExpr)
  def stddevSamp(c: Column): AggSplit = AggSplit(momentsPartial(c), momentsReAgg, st => sqrt(varSampExpr(st)))
  def stddevPop(c: Column): AggSplit = AggSplit(momentsPartial(c), momentsReAgg, st => sqrt(varPopExpr(st)))

  /** Bivariate family → {n, Σx, Σx², Σy, Σy², Σxy} state (float8[6] in the
    * reference, sql:267-457). Convention matches SQL: corr(y, x).
    */
  private def bivarPartial(y: Column, x: Column): Column = {
    val yy = y.cast("double"); val xx = x.cast("double")
    // only rows where both sides are non-null count (SQL semantics)
    val both = when(yy.isNotNull && xx.isNotNull, 1)
    struct(
      org.apache.spark.sql.functions.count(both).as("n"),
      sum(when(both.isNotNull, xx)).as("sx"),
      sum(when(both.isNotNull, xx * xx)).as("sxx"),
      sum(when(both.isNotNull, yy)).as("sy"),
      sum(when(both.isNotNull, yy * yy)).as("syy"),
      sum(when(both.isNotNull, xx * yy)).as("sxy"))
  }
  private def bivarReAgg(st: Column): Column = struct(
    sum(st.getField("n")).as("n"),
    sum(st.getField("sx")).as("sx"),
    sum(st.getField("sxx")).as("sxx"),
    sum(st.getField("sy")).as("sy"),
    sum(st.getField("syy")).as("syy"),
    sum(st.getField("sxy")).as("sxy"))

  def corrOf(y: Column, x: Column): AggSplit = AggSplit(bivarPartial(y, x), bivarReAgg, { st =>
    val n = st.getField("n")
    val sx = st.getField("sx"); val sxx = st.getField("sxx")
    val sy = st.getField("sy"); val syy = st.getField("syy"); val sxy = st.getField("sxy")
    val cov = sxy - sx * sy / n
    val vx = sxx - sx * sx / n
    val vy = syy - sy * sy / n
    when(n > 0 && vx > 0 && vy > 0, cov / sqrt(vx * vy))
  })
  def covarPop(y: Column, x: Column): AggSplit = AggSplit(bivarPartial(y, x), bivarReAgg, { st =>
    val n = st.getField("n")
    when(n > 0, (st.getField("sxy") - st.getField("sx") * st.getField("sy") / n) / n)
  })
  def covarSamp(y: Column, x: Column): AggSplit = AggSplit(bivarPartial(y, x), bivarReAgg, { st =>
    val n = st.getField("n")
    when(n > 1, (st.getField("sxy") - st.getField("sx") * st.getField("sy") / n) / (n - 1))
  })

  // regr_* family — all finalize off the same 6-moment bivariate state
  // (reference sql:267-457 keeps float8[6] for every one of them)
  def regrCount(y: Column, x: Column): AggSplit =
    AggSplit(bivarPartial(y, x), bivarReAgg, st => st.getField("n"))
  def regrAvgX(y: Column, x: Column): AggSplit =
    AggSplit(bivarPartial(y, x), bivarReAgg, st =>
      when(st.getField("n") > 0, st.getField("sx") / st.getField("n")))
  def regrAvgY(y: Column, x: Column): AggSplit =
    AggSplit(bivarPartial(y, x), bivarReAgg, st =>
      when(st.getField("n") > 0, st.getField("sy") / st.getField("n")))
  def regrSXX(y: Column, x: Column): AggSplit =
    AggSplit(bivarPartial(y, x), bivarReAgg, st =>
      when(st.getField("n") > 0,
        st.getField("sxx") - st.getField("sx") * st.getField("sx") / st.getField("n")))
  def regrSYY(y: Column, x: Column): AggSplit =
    AggSplit(bivarPartial(y, x), bivarReAgg, st =>
      when(st.getField("n") > 0,
        st.getField("syy") - st.getField("sy") * st.getField("sy") / st.getField("n")))
  def regrSXY(y: Column, x: Column): AggSplit =
    AggSplit(bivarPartial(y, x), bivarReAgg, st =>
      when(st.getField("n") > 0,
        st.getField("sxy") - st.getField("sx") * st.getField("sy") / st.getField("n")))
  def regrSlope(y: Column, x: Column): AggSplit =
    AggSplit(bivarPartial(y, x), bivarReAgg, { st =>
      val n = st.getField("n")
      val vx = st.getField("sxx") - st.getField("sx") * st.getField("sx") / n
      val cov = st.getField("sxy") - st.getField("sx") * st.getField("sy") / n
      when(n > 0 && vx =!= 0.0, cov / vx)
    })
  def regrIntercept(y: Column, x: Column): AggSplit =
    AggSplit(bivarPartial(y, x), bivarReAgg, { st =>
      val n = st.getField("n")
      val vx = st.getField("sxx") - st.getField("sx") * st.getField("sx") / n
      val cov = st.getField("sxy") - st.getField("sx") * st.getField("sy") / n
      when(n > 0 && vx =!= 0.0,
        (st.getField("sy") - (cov / vx) * st.getField("sx")) / n)
    })
  def regrR2(y: Column, x: Column): AggSplit =
    AggSplit(bivarPartial(y, x), bivarReAgg, { st =>
      val n = st.getField("n")
      val vx = st.getField("sxx") - st.getField("sx") * st.getField("sx") / n
      val vy = st.getField("syy") - st.getField("sy") * st.getField("sy") / n
      val cov = st.getField("sxy") - st.getField("sx") * st.getField("sy") / n
      when(n > 0 && vx =!= 0.0,
        when(vy === 0.0, lit(1.0)).otherwise(cov * cov / (vx * vy)))
    })

  /** bool_and/every and bool_or: PG built-ins the reference exercises in
    * cont_bool_agg.sql — combinable as min/max over the boolean (false < true
    * makes min ≡ AND and max ≡ OR, the same trick the reference's
    * booland_statefunc/boolor_statefunc rely on).
    */
  def boolAnd(c: Column): AggSplit =
    AggSplit(min(c.cast("boolean")), s => min(s), identity)

  def boolOr(c: Column): AggSplit =
    AggSplit(max(c.cast("boolean")), s => max(s), identity)

  /** bit_and/bit_or: associative bitwise folds — partial and merge are the
    * same aggregate (cont_bool_agg.sql exercises them alongside bool_*).
    */
  def bitAnd(c: Column): AggSplit =
    AggSplit(bit_and(c), s => bit_and(s), identity)

  def bitOr(c: Column): AggSplit =
    AggSplit(bit_or(c), s => bit_or(s), identity)

  /** combinable_string_agg (aggfuncs.c:989-1230): array state, delimiter
    * join at finalize; sorted for deterministic output (the reference's
    * combine order is nondeterministic — we pick a canonical order).
    */
  def stringAgg(c: Column, delim: String): AggSplit = AggSplit(
    partial = collect_list(c.cast("string")),
    reAgg = s => flatten(collect_list(s)),
    finalizer = s => array_join(sort_array(s), delim))

  /** count(DISTINCT x) → HLL state (the reference's forced rewrite,
    * analyzer.c:91-106: hll_count_distinct).
    */
  def hllCountDistinct(c: Column): AggSplit = AggSplit(
    partial = GraftFunctions.hll_agg(c),
    reAgg = s => GraftFunctions.hll_union_agg(s),
    finalizer = s => GraftFunctions.hll_cardinality(s))

  def hllAgg(c: Column): AggSplit = AggSplit(
    GraftFunctions.hll_agg(c), s => GraftFunctions.hll_union_agg(s), identity)

  def bloomAgg(c: Column): AggSplit = AggSplit(
    GraftFunctions.bloom_agg(c), s => GraftFunctions.bloom_union_agg(s), identity)

  def freqAgg(c: Column): AggSplit = AggSplit(
    GraftFunctions.freq_agg(c), s => GraftFunctions.freq_merge_agg(s), identity)

  def distAgg(c: Column): AggSplit = AggSplit(
    GraftFunctions.dist_agg(c), s => GraftFunctions.dist_merge_agg(s), identity)

  def topkAgg(c: Column, k: Int): AggSplit = AggSplit(
    GraftFunctions.topk_agg(c, k), s => GraftFunctions.topk_merge_agg(s), identity)

  /** set_agg / array_agg(DISTINCT) → dedup array state (aggfuncs.c:315-460).
    * Sorted for deterministic output.
    */
  def setAgg(c: Column): AggSplit = AggSplit(
    partial = sort_array(collect_set(c)),
    reAgg = s => sort_array(array_distinct(flatten(collect_list(s)))),
    finalizer = identity)

  /** combinable_array_agg → concatenated array state (order follows combine
    * order, nondeterministic like the reference — aggfuncs.c:62-313).
    */
  def arrayAgg(c: Column): AggSplit = AggSplit(
    partial = collect_list(c),
    reAgg = s => flatten(collect_list(s)),
    finalizer = identity)

  /** keyed_min/keyed_max (kv.c): state keeps {ord, val} so merges can
    * re-compare.
    */
  def keyedMin(ord: Column, value: Column): AggSplit = AggSplit(
    partial = min_by(struct(ord.as("o"), value.as("v")), ord),
    reAgg = s => min_by(s, s.getField("o")),
    finalizer = s => s.getField("v"))

  def keyedMax(ord: Column, value: Column): AggSplit = AggSplit(
    partial = max_by(struct(ord.as("o"), value.as("v")), ord),
    reAgg = s => max_by(s, s.getField("o")),
    finalizer = s => s.getField("v"))

  /** Guard on the exact-percentile full-sample state (see [[percentileCont]]):
    * the reference serializes the whole sorted set per group
    * (cq_percentile_cont, sql:1503-1602), which is faithful but UNBOUNDED —
    * at 100-TB scale a hot group's state would grow without limit. Any
    * percentile state exceeding this many values fails loudly (raise_error
    * naming the alternative) instead of silently absorbing memory; raise it
    * (or use dist_agg/dist_quantile, the bounded t-digest path) for groups
    * that legitimately need more. Read at CV-plan time.
    */
  @volatile var percentileMaxSample: Int = 8 * 1024 * 1024

  private def cappedSample(arr: Column): Column = {
    val cap = percentileMaxSample
    when(size(arr) > cap,
      raise_error(lit(s"percentile_cont: group sample exceeds $cap values " +
        "(AggSplit.percentileMaxSample); use dist_agg/dist_quantile " +
        "(t-digest) for unbounded groups or raise the cap")))
      .otherwise(arr)
  }

  /** Exact percentile_cont (reference cq_percentile_cont keeps the full
    * sorted sample — sql:1503-1602). State = sorted array; finalize does
    * linear interpolation. Sample size per group is capped by
    * [[percentileMaxSample]].
    */
  def percentileCont(c: Column, q: Double): AggSplit = AggSplit(
    partial = cappedSample(sort_array(collect_list(c.cast("double")))),
    reAgg = s => cappedSample(sort_array(flatten(collect_list(s)))),
    finalizer = { s =>
      val n = size(s)
      val idx = (n - 1).cast("double") * lit(q)
      val lo = floor(idx).cast("int")
      val hi = ceil(idx).cast("int")
      val frac = idx - lo.cast("double")
      when(n > 0,
        element_at(s, lo + 1) * (lit(1.0) - frac) + element_at(s, hi + 1) * frac)
    })

  /** percentile_cont over an ARRAY of quantiles — one shared full-sample
    * state, finalize interpolates each q (reference sql:1503-1602 array
    * overloads).
    */
  def percentileContMulti(c: Column, qs: Seq[Double]): AggSplit = AggSplit(
    partial = cappedSample(sort_array(collect_list(c.cast("double")))),
    reAgg = s => cappedSample(sort_array(flatten(collect_list(s)))),
    finalizer = { s =>
      val n = size(s)
      val parts = qs.map { q =>
        val idx = (n - 1).cast("double") * lit(q)
        val lo = floor(idx).cast("int")
        val hi = ceil(idx).cast("int")
        val frac = idx - lo.cast("double")
        element_at(s, lo + 1) * (lit(1.0) - frac) + element_at(s, hi + 1) * frac
      }
      when(n > 0, array(parts: _*))
    },
    kind = s"percentile_cont_multi:${qs.mkString(",")}")

  /** first_values(n): smallest-n mergeable list. Backed by the bounded
    * bottom-k TypedImperativeAggregate so per-group state is O(n) during
    * the partial pass too — `slice(sort_array(collect_list))` would hold
    * the whole group in one buffer before slicing.
    */
  def firstValues(c: Column, n: Int): AggSplit = AggSplit(
    partial = GraftFunctions.bottom_k(c, n),
    reAgg = s => GraftFunctions.bottom_k_merge(s, n),
    finalizer = identity)
}
