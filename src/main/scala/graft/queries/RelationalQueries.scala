package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The continuous-aggregate inventory of SURVEY.md §2.5, expressed as batch
  * queries over the driver testdata so the DuckDB oracle can verify the exact
  * aggregates (count/sum/avg/min/max/var/stddev/corr/covar/regr_*, set_agg,
  * exact_count_distinct, keyed_min/max, first_values, string_agg,
  * json_object_int_sum, grouping sets, date_round bucketing, sliding-window
  * filters, top-k, LIMIT).
  *
  * Reference semantics: /root/reference/pipelinedb--1.0.0.sql:142-2575 (the
  * aggregate surface) and src/test/regress/sql/cont_*.sql. PipelineDB keeps
  * these as incrementally-merged partial states; the streaming variants with
  * stored state live in graft.cv — these definitions pin down the *finalized*
  * semantics each overlay view must produce.
  *
  * Float-returning aggregates are rounded (4-6 digits) on BOTH sides so that
  * summation-order differences between engines cannot flip the comparison.
  * Every output is deterministically ordered and every column aliased
  * identically in the Spark plan and the oracle SQL.
  */
object RelationalQueries {

  val all: Seq[QDef] = Seq(
    // --- cont_count.sql: COUNT per group (the README hello-world CV) ---
    QDef(
      "q_count_group",
      """SELECT event_type, count(*) AS n, count(value) AS n_value,
        |       count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) {
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy("event_type")
          .agg(
            count(lit(1)).as("n"),
            count(col("value")).as("n_value"),
            countDistinct(col("user_id")).as("n_users"))
          .orderBy("event_type")
    },

    // --- cont_sum.sql / cont_min_max.sql ---
    QDef(
      "q_sum_min_max",
      """SELECT l_returnflag, round(sum(l_quantity), 2) AS sum_qty,
        |       min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
        |       round(sum(l_extendedprice), 2) AS sum_price,
        |       count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) {
      (s, dir) =>
        Tables.lineitem(s, dir)
          .groupBy("l_returnflag")
          .agg(
            round(sum("l_quantity"), 2).as("sum_qty"),
            min("l_quantity").as("min_qty"),
            max("l_quantity").as("max_qty"),
            round(sum("l_extendedprice"), 2).as("sum_price"),
            count(lit(1)).as("n"))
          .orderBy("l_returnflag")
    },

    // --- cont_avg.sql ---
    QDef(
      "q_avg",
      """SELECT l_returnflag, l_linestatus,
        |       round(avg(l_quantity), 6) AS avg_qty,
        |       round(avg(l_discount), 6) AS avg_disc
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) {
      (s, dir) =>
        Tables.lineitem(s, dir)
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            round(avg("l_quantity"), 6).as("avg_qty"),
            round(avg("l_discount"), 6).as("avg_disc"))
          .orderBy("l_returnflag", "l_linestatus")
    },

    // --- cont_stats_agg.sql: variance family ---
    QDef(
      "q_var_stddev",
      """SELECT l_returnflag,
        |       round(var_samp(l_quantity), 4) AS vs,
        |       round(var_pop(l_quantity), 4) AS vp,
        |       round(stddev_samp(l_quantity), 4) AS ss,
        |       round(stddev_pop(l_quantity), 4) AS sp
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) {
      (s, dir) =>
        Tables.lineitem(s, dir)
          .groupBy("l_returnflag")
          .agg(
            round(var_samp(col("l_quantity")), 4).as("vs"),
            round(var_pop(col("l_quantity")), 4).as("vp"),
            round(stddev_samp(col("l_quantity")), 4).as("ss"),
            round(stddev_pop(col("l_quantity")), 4).as("sp"))
          .orderBy("l_returnflag")
    },

    // --- cont_regr.sql: bivariate statistics (float8[6] state in reference) ---
    QDef(
      "q_regr",
      """SELECT l_returnflag,
        |       round(corr(l_extendedprice, l_quantity), 6) AS r,
        |       round(covar_pop(l_extendedprice, l_quantity), 2) AS cvp,
        |       round(covar_samp(l_extendedprice, l_quantity), 2) AS cvs,
        |       round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
        |       round(regr_intercept(l_extendedprice, l_quantity), 2) AS icept,
        |       round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
        |       regr_count(l_extendedprice, l_quantity) AS n,
        |       round(regr_avgx(l_extendedprice, l_quantity), 4) AS ax,
        |       round(regr_avgy(l_extendedprice, l_quantity), 2) AS ay
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) {
      (s, dir) =>
        val y = col("l_extendedprice"); val x = col("l_quantity")
        Tables.lineitem(s, dir)
          .groupBy("l_returnflag")
          .agg(
            round(corr(y, x), 6).as("r"),
            round(covar_pop(y, x), 2).as("cvp"),
            round(covar_samp(y, x), 2).as("cvs"),
            round(regr_slope(y, x), 4).as("slope"),
            round(regr_intercept(y, x), 2).as("icept"),
            round(regr_r2(y, x), 6).as("r2"),
            regr_count(y, x).as("n"),
            round(regr_avgx(y, x), 4).as("ax"),
            round(regr_avgy(y, x), 2).as("ay"))
          .orderBy("l_returnflag")
    },

    // --- cont_distinct.sql / set_agg / exact_count_distinct ---
    QDef(
      "q_set_agg",
      """SELECT event_type,
        |       count(DISTINCT user_id) AS set_card,
        |       round(sum(DISTINCT value), 2) AS sum_distinct
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) {
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy("event_type")
          .agg(
            size(collect_set(col("user_id"))).cast("long").as("set_card"),
            round(sum_distinct(col("value")), 2).as("sum_distinct"))
          .orderBy("event_type")
    },

    // --- keyed_min_max.sql: argmin/argmax (kv.c). Ties on value exist at
    //     larger SFs, so the ordering key is the (value, event_id) pair on
    //     the Spark side and the oracle picks the matching extreme id —
    //     deterministic on both engines. ---
    QDef(
      "q_keyed_min_max",
      """WITH m AS (SELECT event_type, min(value) AS mn, max(value) AS mx
        |           FROM events GROUP BY event_type)
        |SELECT e.event_type,
        |       min(CASE WHEN e.value = m.mn THEN e.event_id END) AS argmin_ev,
        |       max(CASE WHEN e.value = m.mx THEN e.event_id END) AS argmax_ev,
        |       round(min(e.value), 2) AS min_v, round(max(e.value), 2) AS max_v
        |FROM events e JOIN m USING (event_type)
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin) {
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy("event_type")
          .agg(
            min_by(col("event_id"), struct(col("value"), col("event_id"))).as("argmin_ev"),
            max_by(col("event_id"), struct(col("value"), col("event_id"))).as("argmax_ev"),
            round(min("value"), 2).as("min_v"),
            round(max("value"), 2).as("max_v"))
          .orderBy("event_type")
    },

    // --- first_values.sql: mergeable smallest-n list ---
    QDef(
      "q_first_values",
      """SELECT event_type,
        |       array_to_string((list_sort(list(event_id)))[1:5], ',') AS first5
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) {
      (s, dir) =>
        // Output as a joined string: the gate's row-sort chokes on list cells.
        // Runs the real O(k) BottomKAgg (not collect_list+slice) so the oracle
        // proves the bounded partial→shuffle→merge split at group sizes ≫ k.
        Tables.events(s, dir)
          .groupBy("event_type")
          .agg(concat_ws(",",
            graft.functions.GraftFunctions.bottom_k(col("event_id"), 5)
              .cast("array<string>"))
            .as("first5"))
          .orderBy("event_type")
    },

    // first_values combine(): re-aggregating STORED ≤k partial states (the
    // two-level spelling a chained CV uses) must equal one flat aggregation.
    QDef(
      "q_first_values_combine",
      """SELECT event_type,
        |       array_to_string((list_sort(list(event_id)))[1:5], ',') AS first5
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) {
      (s, dir) =>
        import graft.functions.GraftFunctions.{bottom_k, bottom_k_merge}
        val partials = Tables.events(s, dir)
          .groupBy(col("event_type"), pmod(col("event_id"), lit(7)).as("shard"))
          .agg(bottom_k(col("event_id"), 5).as("part"))
        partials
          .groupBy("event_type")
          .agg(concat_ws(",", bottom_k_merge(col("part"), 5).cast("array<string>"))
            .as("first5"))
          .orderBy("event_type")
    },

    // --- combinable_string_agg (aggfuncs.c:989-1230) ---
    QDef(
      "q_string_agg",
      """SELECT r.r_name, string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations
        |FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY r.r_name ORDER BY r.r_name""".stripMargin) {
      (s, dir) =>
        val n = Tables.nation(s, dir)
        val r = Tables.region(s, dir)
        n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .groupBy(r("r_name"))
          .agg(array_join(sort_array(collect_list(n("n_name"))), ",").as("nations"))
          .orderBy("r_name")
    },

    // --- json_object_int_sum (json.c): sum int values out of {"k": n} ---
    QDef(
      "q_json_int_sum",
      """SELECT event_type,
        |       CAST(sum(CAST(regexp_extract(props, '[0-9]+', 0) AS BIGINT)) AS BIGINT) AS k_sum
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) {
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy("event_type")
          .agg(sum(regexp_extract(col("props"), "[0-9]+", 0).cast("long")).as("k_sum"))
          .orderBy("event_type")
    },

    // --- combinable_array_agg (aggfuncs.c:62-313): combine-order semantics
    //     are nondeterministic like the reference's, so the oracle compares
    //     under an explicit sort; the array is string-joined so the result
    //     column stays scalar-hashable for the oracle harness ---
    QDef(
      "q_array_agg",
      """SELECT user_id, array_to_string(list_sort(list(event_id)), ',') AS arr
        |FROM events WHERE user_id < 5 GROUP BY user_id ORDER BY user_id""".stripMargin) {
      (s, dir) =>
        graft.functions.GraftFunctions.register(s)
        Tables.events(s, dir).where(col("user_id") < 5)
          .groupBy("user_id")
          .agg(array_join(sort_array(expr("combinable_array_agg(event_id)")), ",").as("arr"))
          .orderBy("user_id")
    },

    // --- json_agg (json.c): canonical sorted array-to-json; DuckDB builds
    //     the identical compact text with an ordered string_agg ---
    QDef(
      "q_json_agg",
      """SELECT user_id,
        |       '[' || string_agg(CAST(event_id AS VARCHAR), ',' ORDER BY event_id) || ']' AS j
        |FROM events WHERE user_id < 5 GROUP BY user_id ORDER BY user_id""".stripMargin) {
      (s, dir) =>
        graft.functions.GraftFunctions.register(s)
        Tables.events(s, dir).where(col("user_id") < 5)
          .groupBy("user_id")
          .agg(expr("json_agg(event_id)").as("j"))
          .orderBy("user_id")
    },

    // --- json_object_agg (json.c): sorted keys, greatest-value-per-key
    //     dedup — deterministic under parallel merge, mirrored in DuckDB ---
    QDef(
      "q_json_object_agg",
      """WITH m AS (
        |  SELECT user_id % 10 AS ub, event_type, max(event_id) AS v
        |  FROM events GROUP BY 1, 2)
        |SELECT ub,
        |       '{' || string_agg('"' || event_type || '":' || v, ',' ORDER BY event_type) || '}' AS j
        |FROM m GROUP BY ub ORDER BY ub""".stripMargin) {
      (s, dir) =>
        graft.functions.GraftFunctions.register(s)
        Tables.events(s, dir)
          .groupBy((col("user_id") % 10).as("ub"))
          .agg(expr("json_object_agg(event_type, event_id)").as("j"))
          .orderBy("ub")
    },

    // --- stream_table_join.sql: stream–table join (events ⋈ dims) ---
    QDef(
      "q_stream_table_join",
      """SELECT n.n_name, count(*) AS n_events, round(sum(e.value), 2) AS total
        |FROM events e
        |JOIN customer c ON e.user_id = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY n.n_name ORDER BY n.n_name""".stripMargin) {
      (s, dir) =>
        val e = Tables.events(s, dir)
        val c = Tables.customer(s, dir).select("c_custkey", "c_nationkey")
        val n = Tables.nation(s, dir)
        // customer scales with SF: let AQE choose the join strategy
        e.join(c, e("user_id") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .groupBy(n("n_name"))
          .agg(count(lit(1)).as("n_events"), round(sum(e("value")), 2).as("total"))
          .orderBy("n_name")
    },

    // --- TPC-H-ish flagship: revenue per nation through the full star join ---
    QDef(
      "q_revenue_nation",
      """SELECT n.n_name,
        |       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
        |       count(*) AS n_items
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY n.n_name ORDER BY n.n_name""".stripMargin) {
      (s, dir) =>
        val l = Tables.lineitem(s, dir).select("l_orderkey", "l_extendedprice", "l_discount")
        val o = Tables.orders(s, dir).select("o_orderkey", "o_custkey")
        val c = Tables.customer(s, dir).select("c_custkey", "c_nationkey")
        val n = Tables.nation(s, dir).select("n_nationkey", "n_name")
        // customer grows with SF — no broadcast hint; AQE's size check picks
        // broadcast at bench SFs and a shuffle join beyond its threshold.
        // nation is a fixed 25 rows, always broadcast-safe.
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .groupBy(n("n_name"))
          .agg(
            round(sum(l("l_extendedprice") * (lit(1) - l("l_discount"))), 2).as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy("n_name")
    },

    // --- cont_grouping_sets.sql: ROLLUP with grouping() flags ---
    QDef(
      "q_rollup",
      """SELECT l_returnflag, l_linestatus,
        |       grouping(l_returnflag)*2 + grouping(l_linestatus) AS gid,
        |       count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin) {
      (s, dir) =>
        Tables.lineitem(s, dir)
          .rollup("l_returnflag", "l_linestatus")
          .agg(
            (grouping(col("l_returnflag")) * 2 + grouping(col("l_linestatus")))
              .cast("long").as("gid"),
            count(lit(1)).as("n"),
            round(sum("l_quantity"), 2).as("sum_qty"))
          .orderBy("gid", "l_returnflag", "l_linestatus")
    },

    // --- cont_grouping_sets.sql: CUBE ---
    QDef(
      "q_cube",
      """SELECT o_orderstatus, o_orderpriority,
        |       grouping(o_orderstatus)*2 + grouping(o_orderpriority) AS gid,
        |       count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY gid, o_orderstatus, o_orderpriority""".stripMargin) {
      (s, dir) =>
        Tables.orders(s, dir)
          .cube("o_orderstatus", "o_orderpriority")
          .agg(
            (grouping(col("o_orderstatus")) * 2 + grouping(col("o_orderpriority")))
              .cast("long").as("gid"),
            count(lit(1)).as("n"),
            round(sum("o_totalprice"), 2).as("total"))
          .orderBy("gid", "o_orderstatus", "o_orderpriority")
    },

    // --- date_round (miscutils.c:305-331): arbitrary-interval bucketing.
    //     15-minute buckets as epoch-second longs (type-stable across engines).
    QDef(
      "q_date_round",
      """SELECT CAST(floor(epoch(ts)/900)*900 AS BIGINT) AS bucket,
        |       count(*) AS n
        |FROM events GROUP BY 1 ORDER BY bucket LIMIT 200""".stripMargin) {
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy((floor(col("ts").cast("double") / 900) * 900).cast("long").as("bucket"))
          .agg(count(lit(1)).as("n"))
          .orderBy("bucket")
          .limit(200)
    },

    // --- sliding window semantics: WHERE ts > (max ts) - interval '7 days'
    //     (analyzer.c:1672-1768 desugars sw into exactly this predicate;
    //     max(ts) stands in for clock_timestamp() on static data) ---
    QDef(
      "q_sliding_window",
      """SELECT event_type, count(*) AS n, round(sum(value), 2) AS total
        |FROM events
        |WHERE ts > (SELECT max(ts) FROM events) - INTERVAL 7 DAY
        |GROUP BY event_type ORDER BY event_type""".stripMargin) {
      (s, dir) =>
        val e = Tables.events(s, dir)
        val maxTs = e.agg(max("ts").as("max_ts"))
        e.join(broadcast(maxTs))
          .where(col("ts") > col("max_ts") - expr("INTERVAL 7 DAY"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
          .orderBy("event_type")
    },

    // --- topk_agg (fss.c): exact top-3 users per event_type, deterministic
    //     tie-break on user_id ---
    QDef(
      "q_topk",
      """SELECT event_type, user_id, n FROM (
        |  SELECT event_type, user_id, count(*) AS n,
        |         row_number() OVER (PARTITION BY event_type
        |                            ORDER BY count(*) DESC, user_id) AS rk
        |  FROM events GROUP BY event_type, user_id) t
        |WHERE rk <= 3 ORDER BY event_type, n DESC, user_id""".stripMargin) {
      (s, dir) =>
        val counts = Tables.events(s, dir)
          .groupBy("event_type", "user_id")
          .agg(count(lit(1)).as("n"))
        val w = Window.partitionBy("event_type").orderBy(col("n").desc, col("user_id"))
        counts.withColumn("rk", row_number().over(w))
          .where(col("rk") <= 3)
          .select("event_type", "user_id", "n")
          .orderBy(col("event_type"), col("n").desc, col("user_id"))
    },

    // --- cont_limit.sql: LIMIT as a materialization cap ---
    QDef(
      "q_limit",
      "SELECT event_id, user_id FROM events ORDER BY event_id LIMIT 100") {
      (s, dir) =>
        Tables.events(s, dir)
          .select("event_id", "user_id")
          .orderBy("event_id")
          .limit(100)
    },

    // --- cont_distinct.sql: SELECT DISTINCT made explicit grouping ---
    QDef(
      "q_distinct",
      """SELECT DISTINCT event_type, user_id FROM events
        |ORDER BY event_type, user_id""".stripMargin) {
      (s, dir) =>
        Tables.events(s, dir)
          .select("event_type", "user_id")
          .distinct()
          .orderBy("event_type", "user_id")
    },

    // --- combinable_percentile_cont (sql:1503-1602): exact ordered-set
    //     percentile — reference stores the full sorted sample ---
    QDef(
      "q_percentile",
      """SELECT l_returnflag,
        |       round(percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity), 4) AS p50,
        |       round(percentile_cont(0.9) WITHIN GROUP (ORDER BY l_quantity), 4) AS p90,
        |       round(percentile_cont(0.99) WITHIN GROUP (ORDER BY l_quantity), 4) AS p99
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) {
      (s, dir) =>
        Tables.lineitem(s, dir)
          .groupBy("l_returnflag")
          .agg(
            round(expr("percentile(l_quantity, 0.5)"), 4).as("p50"),
            round(expr("percentile(l_quantity, 0.9)"), 4).as("p90"),
            round(expr("percentile(l_quantity, 0.99)"), 4).as("p99"))
          .orderBy("l_returnflag")
    },

    // --- hypothetical-set combinable_rank / percent_rank / cume_dist
    //     (sql:1274-1502): rank of a hypothetical value = 1 + count(below) ---
    QDef(
      "q_hypothetical_rank",
      """SELECT event_type,
        |       1 + count(*) FILTER (WHERE value < 100.0) AS hypo_rank,
        |       count(*) FILTER (WHERE value <= 100.0) AS cume_n,
        |       count(*) AS total
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) {
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy("event_type")
          .agg(
            (lit(1) + count(when(col("value") < 100.0, 1))).as("hypo_rank"),
            count(when(col("value") <= 100.0, 1)).as("cume_n"),
            count(lit(1)).as("total"))
          .orderBy("event_type")
    })
}
