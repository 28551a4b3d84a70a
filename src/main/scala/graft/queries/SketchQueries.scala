package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Probabilistic-aggregate queries exercising the sketch layer end-to-end
  * (SURVEY §2.5: hll_agg/hll_count_distinct/hll_union_agg, bloom_agg +
  * bloom_contains, freq_agg/freq, topk_agg + extractors, dist_agg +
  * dist_quantile).
  *
  * Oracle strategy: sketch estimates are only DuckDB-checkable where the
  * data domain makes the sketch provably exact —
  *   - HLL with linear counting is exact for n ≪ √m (event_type: 5 distinct),
  *   - CMS point queries are exact when no key collides in all d rows
  *     (user_id: ≤1500 keys in a 1360×6 table; verified deterministic on
  *     the fixed testdata),
  *   - SpaceSaving is exact while distinct ≤ capacity (event_type per
  *     nation: 5 ≤ 15),
  *   - Bloom has no false negatives ever.
  * Estimation-mode queries (hll on 150+ keys, t-digest quantiles) register
  * without oracle → the driver's rows-only check; their accuracy is covered
  * by ScalaTest suites instead.
  */
object SketchQueries {
  import GraftFunctions.{bloom_agg, bloom_contains, bloom_intersection_agg, bloom_union_agg,
    dist_agg, dist_quantile, freq, freq_agg, freq_total, hll_agg, hll_cardinality,
    hll_count_distinct, topk_agg, topk_freqs, topk_values}

  val all: Seq[QDef] = Seq(
    // HLL as count(DISTINCT) replacement — exact on a 5-value domain.
    QDef(
      "q_hll_types_per_user",
      """SELECT user_id, count(DISTINCT event_type) AS n_types
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) {
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy("user_id")
          .agg(hll_count_distinct(col("event_type")).as("n_types"))
          .orderBy("user_id")
    },

    // Partial HLL states → union-agg rollup → finalize (the combine() path).
    QDef(
      "q_hll_union_rollup",
      "SELECT count(DISTINCT event_type) AS n_types FROM events") {
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy("user_id")
          .agg(hll_agg(col("event_type")).as("state"))
          .agg(hll_cardinality(GraftFunctions.hll_union_agg(col("state"))).as("n_types"))
    },

    // Bloom membership: every present key must probe true (no false
    // negatives), so the contained-count equals exact distinct count.
    QDef(
      "q_bloom_membership",
      """SELECT event_type, count(DISTINCT user_id) AS n_contained
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) {
      (s, dir) =>
        val e = Tables.events(s, dir)
        val states = e.groupBy("event_type")
          .agg(bloom_agg(col("user_id").cast("string")).as("bf"))
        val probes = e.select(col("event_type"), col("user_id").cast("string").as("u")).distinct()
        probes.join(broadcast(states), "event_type")
          .where(bloom_contains(col("bf"), col("u")))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_contained"))
          .orderBy("event_type")
    },

    // Bloom union/intersection merges (bloomfuncs.c:110-462): probe only
    // guaranteed-true domains — union keeps every bit of both filters (no
    // false negatives survive a union), and a true A∩B member has its bits
    // set in both inputs, so the AND-intersection always contains it.
    QDef(
      "q_bloom_setops",
      """SELECT
        |  (SELECT count(DISTINCT user_id) FROM events
        |   WHERE user_id % 3 = 0 OR user_id % 5 = 0) AS n_union,
        |  (SELECT count(DISTINCT user_id) FROM events
        |   WHERE user_id % 15 = 0) AS n_inter""".stripMargin) {
      (s, dir) =>
        val e = Tables.events(s, dir)
        def u = col("user_id")
        val a = e.where(pmod(u, lit(3)) === 0).agg(bloom_agg(u.cast("string")).as("bf"))
        val b = e.where(pmod(u, lit(5)) === 0).agg(bloom_agg(u.cast("string")).as("bf"))
        val merged = a.unionByName(b)
          .agg(bloom_union_agg(col("bf")).as("ubf"),
            bloom_intersection_agg(col("bf")).as("ibf"))
        e.select(u).distinct()
          .crossJoin(broadcast(merged)) // 1-row sketch frame
          .agg(
            count(when((pmod(u, lit(3)) === 0 || pmod(u, lit(5)) === 0) &&
              bloom_contains(col("ubf"), u.cast("string")), 1)).as("n_union"),
            count(when(pmod(u, lit(15)) === 0 &&
              bloom_contains(col("ibf"), u.cast("string")), 1)).as("n_inter"))
    },

    // CMS point frequency — exact on the sparse user domain at gate SF.
    QDef(
      "q_freq_users",
      """SELECT event_type,
        |       count(*) FILTER (WHERE user_id = 7) AS f7,
        |       count(*) FILTER (WHERE user_id = 11) AS f11,
        |       count(*) AS total
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) {
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy("event_type")
          .agg(
            freq(freq_agg(col("user_id")), lit(7L)).as("f7"),
            freq(freq_agg(col("user_id")), lit(11L)).as("f11"),
            freq_total(freq_agg(col("user_id"))).as("total"))
          .orderBy("event_type")
    },

    // SpaceSaving top-k — exact while distinct(event_type)=5 ≤ capacity 15;
    // ties break by value string order on both sides.
    QDef(
      "q_topk_sketch",
      """SELECT n_name, rk, etype, cnt FROM (
        |  SELECT n.n_name AS n_name, e.event_type AS etype, count(*) AS cnt,
        |         row_number() OVER (PARTITION BY n.n_name
        |                            ORDER BY count(*) DESC, e.event_type) AS rk
        |  FROM events e
        |  JOIN customer c ON e.user_id = c.c_custkey
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  GROUP BY n.n_name, e.event_type) t
        |WHERE rk <= 3 ORDER BY n_name, rk""".stripMargin) {
      (s, dir) =>
        val e = Tables.events(s, dir)
        val c = Tables.customer(s, dir).select("c_custkey", "c_nationkey")
        val n = Tables.nation(s, dir).select("n_nationkey", "n_name")
        e.join(broadcast(c), e("user_id") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .groupBy(n("n_name"))
          .agg(
            topk_values(topk_agg(col("event_type"), 3)).as("vals"),
            topk_freqs(topk_agg(col("event_type"), 3)).as("cnts"))
          .select(col("n_name"), posexplode(arrays_zip(col("vals"), col("cnts"))))
          .select(
            col("n_name"),
            (col("pos") + 1).cast("long").as("rk"),
            col("col.vals").as("etype"),
            col("col.cnts").as("cnt"))
          .orderBy("n_name", "rk")
    },

    // T-digest quantiles on an exactness domain: groups of ≤ δ=200 points
    // keep every centroid a singleton (TDigest explicit mode), so the
    // midpoint-interpolation read-out is a deterministic function of the
    // sorted sample that DuckDB recomputes verbatim — rank q·n−½, linear
    // interpolation between adjacent order statistics. (event_id < 800 →
    // ≤ ~175 rows per event_type at every SF.)
    QDef(
      "q_dist_quantiles", {
        // t-digest singleton read-out at quantile q over sorted list vs[1..n];
        // every operand is forced to DOUBLE so DuckDB reproduces the same
        // IEEE op sequence as TDigest.quantile (bare 0.9 would be DECIMAL)
        def qx(q: String) = {
          val r = s"(CAST($q AS DOUBLE) * CAST(n AS DOUBLE))"
          s"""CASE WHEN n = 1 OR $r < 0.5 THEN vs[1]
             |     WHEN $r >= CAST(n AS DOUBLE) - 0.5 THEN vs[n]
             |     ELSE vs[CAST(floor($r - 0.5) AS INT) + 1]
             |          + ($r - (CAST(CAST(floor($r - 0.5) AS INT) AS DOUBLE) + 0.5))
             |            * (vs[CAST(floor($r - 0.5) AS INT) + 2]
             |               - vs[CAST(floor($r - 0.5) AS INT) + 1])
             |END""".stripMargin
        }
        s"""WITH g AS (
           |  SELECT event_type, list(value ORDER BY value) AS vs, count(*) AS n
           |  FROM events WHERE event_id < 800 GROUP BY event_type
           |)
           |SELECT event_type,
           |       round(${qx("0.5")}, 4) AS p50,
           |       round(${qx("0.9")}, 4) AS p90,
           |       round(${qx("0.99")}, 4) AS p99
           |FROM g ORDER BY event_type""".stripMargin
      }) { (s, dir) =>
      Tables.events(s, dir)
        .where(col("event_id") < 800)
        .groupBy("event_type")
        .agg(
          round(dist_quantile(dist_agg(col("value")), lit(0.5)), 4).as("p50"),
          round(dist_quantile(dist_agg(col("value")), lit(0.9)), 4).as("p90"),
          round(dist_quantile(dist_agg(col("value")), lit(0.99)), 4).as("p99"))
        .orderBy("event_type")
    },

    // json_object_int_sum over the props column (reference json.c) — the
    // map output probed at key 'k' so the oracle is plain SQL.
    QDef(
      "q_json_object_int_sum",
      """SELECT event_type,
        |       CAST(sum(CAST(regexp_extract(props, '[0-9]+', 0) AS BIGINT)) AS BIGINT) AS k_sum
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) {
      (s, dir) =>
        GraftFunctions.register(s)
        Tables.events(s, dir).createOrReplaceTempView("ev_jois")
        s.sql("""SELECT event_type,
                |       element_at(json_object_int_sum(props), 'k') AS k_sum
                |FROM ev_jois GROUP BY event_type ORDER BY event_type""".stripMargin)
    },

    // bucket_agg: each distinct user lands in the bucket (day-of-month) of
    // their LATEST event (reference bucket_agg.sql semantics).
    QDef(
      "q_bucket_agg",
      """SELECT event_type, bucket, count(*) AS n FROM (
        |  SELECT event_type, user_id, arg_max(CAST(day(ts) AS INT), ts) AS bucket
        |  FROM events GROUP BY event_type, user_id) t
        |GROUP BY event_type, bucket ORDER BY event_type, bucket""".stripMargin) {
      (s, dir) =>
        GraftFunctions.register(s)
        Tables.events(s, dir).createOrReplaceTempView("ev_ba")
        s.sql("""SELECT event_type,
                |       explode(bucket_cardinalities(
                |         bucket_agg(user_id, day(ts), ts))) AS (bucket, n)
                |FROM ev_ba GROUP BY event_type""".stripMargin)
          .orderBy("event_type", "bucket")
    },

    // HLL on the full user domain — the explicit small-range encoding keeps
    // this exact up to m/8 = 2048 distinct (covers every testdata SF).
    QDef(
      "q_hll_users",
      """SELECT event_type, count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) {
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy("event_type")
          .agg(hll_count_distinct(col("user_id")).as("n_users"))
          .orderBy("event_type")
    })
}
