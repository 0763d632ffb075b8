package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.syntax._
import graft.Tables._

/** Join verbs (SURVEY §2.4): conditional_join (mixed equi+non-equi, keep),
  * get_join_indices, and the banded range join.
  */
object QueriesJoin {
  private type Q = (SparkSession, String) => DataFrame

  /** Interval table derived from supplier: [lo, lo+7] on the quantity axis. */
  private def bins(s: SparkSession, d: String): DataFrame =
    supplier(s, d).select(col("s_suppkey"),
      ((col("s_suppkey") % 10) * 5.0d).as("lo"),
      ((col("s_suppkey") % 10) * 5.0d + 7.0d).as("hi"))

  val entries: Map[String, Q] = Map(
    "conditional_join" -> ((s, d) => lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_shipdate")
      .conditionalJoin(
        orders(s, d).select("o_orderkey", "o_orderdate"),
        Seq(("l_orderkey", "o_orderkey", "=="), ("l_shipdate", "o_orderdate", ">")))),
    "conditional_join_keep_first" -> ((s, d) => part(s, d)
      .select("p_partkey", "p_size")
      .conditionalJoin(bins(s, d),
        Seq(("p_size", "lo", ">="), ("p_size", "hi", "<=")),
        keep = "first")),
    "conditional_join_left" -> ((s, d) => part(s, d)
      .select("p_partkey", "p_size")
      .conditionalJoin(bins(s, d),
        Seq(("p_size", "lo", ">="), ("p_size", "hi", "<=")),
        how = "left")),
    "conditional_join_indicator" -> ((s, d) => part(s, d)
      .select("p_partkey", "p_size")
      .conditionalJoin(bins(s, d),
        Seq(("p_size", "lo", ">="), ("p_size", "hi", "<=")),
        how = "left", indicator = true)),
    "conditional_join_keep_last" -> ((s, d) => part(s, d)
      .select("p_partkey", "p_size")
      .conditionalJoin(bins(s, d),
        Seq(("p_size", "lo", ">="), ("p_size", "hi", "<=")),
        keep = "last")),
    "conditional_join_outer" -> ((s, d) => part(s, d)
      .select("p_partkey", "p_size")
      .conditionalJoin(bins(s, d),
        Seq(("p_size", "lo", ">="), ("p_size", "hi", "<=")),
        how = "outer")),
    "conditional_join_ne" -> ((s, d) => nation(s, d)
      .select("n_nationkey", "n_regionkey")
      .conditionalJoin(region(s, d).select("r_regionkey", "r_name"),
        Seq(("n_regionkey", "r_regionkey", "!=")))),
    // != with nulls on both sides: numpy parity — a null pairs with EVERY
    // row on the other side, including the other side's nulls
    // (janitor/functions/utils.py:_not_equal_indices)
    "conditional_join_ne_nulls" -> ((s, d) => nation(s, d)
      .select(col("n_nationkey"),
        when(col("n_nationkey") % 5 === 0, lit(null)).otherwise(col("n_regionkey"))
          .as("n_rk"))
      .conditionalJoin(
        region(s, d).select(
          when(col("r_regionkey") === 2, lit(null)).otherwise(col("r_regionkey"))
            .as("r_rk"), col("r_name")),
        Seq(("n_rk", "r_rk", "!=")))),
    // == is null-safe (pandas merge pairs NaN equi-keys)
    "conditional_join_eq_nullsafe" -> ((s, d) => nation(s, d)
      .select(col("n_nationkey"),
        when(col("n_nationkey") % 5 === 0, lit(null)).otherwise(col("n_regionkey"))
          .as("n_rk"))
      .conditionalJoin(
        region(s, d).select(col("r_regionkey"),
          when(col("r_regionkey") === 2, lit(null)).otherwise(col("r_regionkey"))
            .as("r_rk")),
        Seq(("n_rk", "r_rk", "=="), ("n_nationkey", "r_regionkey", ">")))),
    // right join + keep: a right row whose every match loses the keep race
    // is demoted to an unmatched right_only row (conditional_join.py:1333)
    "conditional_join_right_keep" -> ((s, d) => part(s, d)
      .select("p_partkey", "p_size")
      .conditionalJoin(bins(s, d),
        Seq(("p_size", "lo", ">="), ("p_size", "hi", "<=")),
        how = "right", keep = "first")),
    // force=True reorders the reference's kernels, never the result
    "conditional_join_force" -> ((s, d) => lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_shipdate")
      .conditionalJoin(
        orders(s, d).select("o_orderkey", "o_orderdate"),
        Seq(("l_orderkey", "o_orderkey", "=="), ("l_shipdate", "o_orderdate", ">")),
        force = true)),
    // df_columns / right_columns output selection (conditional_join.py:1186)
    "conditional_join_cols" -> ((s, d) => part(s, d)
      .select("p_partkey", "p_size")
      .conditionalJoin(bins(s, d),
        Seq(("p_size", "lo", ">="), ("p_size", "hi", "<=")),
        dfColumns = Seq("p_partkey"), rightColumns = Seq("s_suppkey"))),
    "get_join_indices" -> ((s, d) => operators.JoinOps.getJoinIndices(
      part(s, d), bins(s, d), Seq("p_partkey"), Seq("s_suppkey"),
      Seq(("p_size", "lo", ">="), ("p_size", "hi", "<=")))),
    "range_join" -> ((s, d) => lineitem(s, d)
      .select("l_orderkey", "l_quantity")
      .rangeJoin(bins(s, d), "l_quantity", "lo", "hi", bandWidth = 5.0d)
      .groupBy(col("s_suppkey")).agg(count(lit(1)).as("n"))),
    // last click at-or-before each view, per user (DuckDB ASOF JOIN oracle);
    // the right side is pre-aggregated to unique (user_id, ts) so the
    // duplicate-timestamp tie-break cannot differ between engines
    "asof_join" -> ((s, d) => {
      val ev = events(s, d)
      ev.filter(col("event_type") === "view").select("event_id", "user_id", "ts")
        .asofJoin(
          ev.filter(col("event_type") === "click")
            .groupBy("user_id", "ts").agg(max(col("value")).as("click_value")),
          on = "ts", by = Seq("user_id"))
    }),
    // global (no-by) as-of: forces the bucketed ScaleWindows.runningLast
    // machinery (smallBytes=0 defeats the adaptive cutover, which would
    // otherwise route sf0.01 to the plain window) so the carry-across-
    // buckets path itself is DuckDB-verified, not just spec'd
    "asof_join_global" -> ((s, d) => {
      val ev = events(s, d)
      val l = ev.filter(col("event_type") === "view").select("event_id", "ts")
      val r = ev.filter(col("event_type") === "click")
        .groupBy("ts").agg(max(col("value")).as("click_value"))
      s.conf.set("graft.scaleWindows.smallBytes", "0")
      try l.asofJoin(r, on = "ts")
      finally s.conf.unset("graft.scaleWindows.smallBytes")
    }),
    // closest click either side of each view; equal distances resolve backward
    "asof_join_nearest" -> ((s, d) => {
      val ev = events(s, d)
      ev.filter(col("event_type") === "view").select("event_id", "user_id", "ts")
        .asofJoin(
          ev.filter(col("event_type") === "click")
            .groupBy("user_id", "ts").agg(max(col("value")).as("click_value")),
          on = "ts", by = Seq("user_id"), direction = "nearest")
    }),
    // first click at-or-after each view, matches farther than 1h nulled
    "asof_join_forward_tol" -> ((s, d) => {
      val ev = events(s, d)
      ev.filter(col("event_type") === "view").select("event_id", "user_id", "ts")
        .asofJoin(
          ev.filter(col("event_type") === "click")
            .groupBy("user_id", "ts").agg(max(col("value")).as("click_value")),
          on = "ts", by = Seq("user_id"),
          direction = "forward", tolerance = Some(3600.0d))
    }),
    // FastSS deletion-neighborhood fuzzy join: c_name ids differ in digits,
    // so distance-1 families are plentiful and the candidate buckets stay
    // family-sized (a theta-join levenshtein<=1 would be the O(n²) BNLJ)
    "fuzzy_self_join" -> ((s, d) =>
      graft.operators.JoinOps.fuzzySelfJoin(
        customer(s, d).select("c_custkey", "c_name"), "c_custkey", "c_name",
        maxDist = 1)),
    "fuzzy_join" -> ((s, d) => {
      val names = customer(s, d).select("c_custkey", "c_name")
      graft.operators.JoinOps.fuzzyJoin(
          names.filter(col("c_custkey") % 100 === 0), names,
          "c_name", "c_name", maxDist = 2)
        .select(col("c_custkey"), col("c_custkey_r"), col("dist"))
    }),
    // char-based Jaro-Winkler kernel vs DuckDB's byte-based function —
    // identical on this ASCII data (probed bit-exact over random ASCII)
    "jaro_winkler" -> ((s, d) => {
      import graft.functions.vector.jaro_winkler
      customer(s, d).select(col("c_custkey"),
        round(jaro_winkler(col("c_name"), reverse(col("c_name"))) * 1e6).cast("long").as("jw_rev"),
        round(jaro_winkler(col("c_name"),
          concat(substring(col("c_name"), 1, 9), lit("X"),
            substring(col("c_name"), 11, 1000))) * 1e6).cast("long").as("jw_sub"),
        round(jaro_winkler(col("c_name"), col("c_name")) * 1e6).cast("long").as("jw_self"))
    })
  )

  val oracles: Map[String, String] = Map(
    "fuzzy_self_join" ->
      """SELECT a.c_custkey AS id1, b.c_custkey AS id2,
        |  levenshtein(a.c_name, b.c_name) AS dist
        |FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
        |WHERE levenshtein(a.c_name, b.c_name) <= 1""".stripMargin,
    "fuzzy_join" ->
      """SELECT a.c_custkey, b.c_custkey AS c_custkey_r,
        |  levenshtein(a.c_name, b.c_name) AS dist
        |FROM customer a JOIN customer b ON a.c_custkey % 100 = 0
        |WHERE levenshtein(a.c_name, b.c_name) <= 2""".stripMargin,
    "jaro_winkler" ->
      """SELECT c_custkey,
        |  CAST(round(jaro_winkler_similarity(c_name, reverse(c_name)) * 1e6) AS BIGINT) AS jw_rev,
        |  CAST(round(jaro_winkler_similarity(c_name,
        |    substr(c_name, 1, 9) || 'X' || substr(c_name, 11)) * 1e6) AS BIGINT) AS jw_sub,
        |  CAST(round(jaro_winkler_similarity(c_name, c_name) * 1e6) AS BIGINT) AS jw_self
        |FROM customer""".stripMargin,
    "conditional_join" ->
      """SELECT l.l_orderkey, l.l_linenumber, l.l_shipdate, o.o_orderkey, o.o_orderdate
        |FROM lineitem l JOIN orders o
        |ON l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate""".stripMargin,
    "conditional_join_keep_first" ->
      """WITH bins AS (SELECT s_suppkey, (s_suppkey % 10) * 5.0 AS lo,
        |  (s_suppkey % 10) * 5.0 + 7.0 AS hi FROM supplier)
        |SELECT p.p_partkey, p.p_size, b.s_suppkey, b.lo, b.hi
        |FROM part p JOIN bins b ON p.p_size >= b.lo AND p.p_size <= b.hi
        |QUALIFY row_number() OVER (PARTITION BY p.p_partkey ORDER BY b.lo, b.hi, b.s_suppkey) = 1""".stripMargin,
    "conditional_join_left" ->
      """WITH bins AS (SELECT s_suppkey, (s_suppkey % 10) * 5.0 AS lo,
        |  (s_suppkey % 10) * 5.0 + 7.0 AS hi FROM supplier)
        |SELECT p.p_partkey, p.p_size, b.s_suppkey, b.lo, b.hi
        |FROM part p LEFT JOIN bins b ON p.p_size >= b.lo AND p.p_size <= b.hi""".stripMargin,
    "conditional_join_indicator" ->
      """WITH bins AS (SELECT s_suppkey, (s_suppkey % 10) * 5.0 AS lo,
        |  (s_suppkey % 10) * 5.0 + 7.0 AS hi FROM supplier)
        |SELECT p.p_partkey, p.p_size, b.s_suppkey, b.lo, b.hi,
        |  CASE WHEN b.s_suppkey IS NULL THEN 'left_only' ELSE 'both' END AS _merge
        |FROM part p LEFT JOIN bins b ON p.p_size >= b.lo AND p.p_size <= b.hi""".stripMargin,
    "conditional_join_ne" ->
      """SELECT n.n_nationkey, n.n_regionkey, r.r_regionkey, r.r_name
        |FROM nation n JOIN region r ON n.n_regionkey <> r.r_regionkey""".stripMargin,
    "conditional_join_ne_nulls" ->
      """WITH l AS (SELECT n_nationkey,
        |  CASE WHEN n_nationkey % 5 = 0 THEN NULL ELSE n_regionkey END AS n_rk
        |  FROM nation),
        |r AS (SELECT CASE WHEN r_regionkey = 2 THEN NULL ELSE r_regionkey END AS r_rk,
        |  r_name FROM region)
        |SELECT l.n_nationkey, l.n_rk, r.r_rk, r.r_name
        |FROM l JOIN r ON (l.n_rk IS NULL OR r.r_rk IS NULL OR l.n_rk <> r.r_rk)""".stripMargin,
    "conditional_join_eq_nullsafe" ->
      """WITH l AS (SELECT n_nationkey,
        |  CASE WHEN n_nationkey % 5 = 0 THEN NULL ELSE n_regionkey END AS n_rk
        |  FROM nation),
        |r AS (SELECT r_regionkey,
        |  CASE WHEN r_regionkey = 2 THEN NULL ELSE r_regionkey END AS r_rk
        |  FROM region)
        |SELECT l.n_nationkey, l.n_rk, r.r_regionkey, r.r_rk
        |FROM l JOIN r ON l.n_rk IS NOT DISTINCT FROM r.r_rk
        |  AND l.n_nationkey > r.r_regionkey""".stripMargin,
    "conditional_join_right_keep" ->
      """WITH bins AS (SELECT s_suppkey, (s_suppkey % 10) * 5.0 AS lo,
        |  (s_suppkey % 10) * 5.0 + 7.0 AS hi FROM supplier),
        |kept AS (
        |  SELECT p.p_partkey, p.p_size, b.s_suppkey, b.lo, b.hi
        |  FROM part p JOIN bins b ON p.p_size >= b.lo AND p.p_size <= b.hi
        |  QUALIFY row_number() OVER (PARTITION BY p.p_partkey
        |    ORDER BY b.lo, b.hi, b.s_suppkey) = 1)
        |SELECT * FROM kept
        |UNION ALL
        |SELECT NULL AS p_partkey, NULL AS p_size, b.s_suppkey, b.lo, b.hi
        |FROM bins b WHERE b.s_suppkey NOT IN (SELECT s_suppkey FROM kept)""".stripMargin,
    "conditional_join_force" ->
      """SELECT l.l_orderkey, l.l_linenumber, l.l_shipdate, o.o_orderkey, o.o_orderdate
        |FROM lineitem l JOIN orders o
        |ON l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate""".stripMargin,
    "conditional_join_cols" ->
      """WITH bins AS (SELECT s_suppkey, (s_suppkey % 10) * 5.0 AS lo,
        |  (s_suppkey % 10) * 5.0 + 7.0 AS hi FROM supplier)
        |SELECT p.p_partkey, b.s_suppkey
        |FROM part p JOIN bins b ON p.p_size >= b.lo AND p.p_size <= b.hi""".stripMargin,
    "conditional_join_keep_last" ->
      """WITH bins AS (SELECT s_suppkey, (s_suppkey % 10) * 5.0 AS lo,
        |  (s_suppkey % 10) * 5.0 + 7.0 AS hi FROM supplier)
        |SELECT p.p_partkey, p.p_size, b.s_suppkey, b.lo, b.hi
        |FROM part p JOIN bins b ON p.p_size >= b.lo AND p.p_size <= b.hi
        |QUALIFY row_number() OVER (PARTITION BY p.p_partkey
        |  ORDER BY b.lo DESC, b.hi DESC, b.s_suppkey DESC) = 1""".stripMargin,
    "conditional_join_outer" ->
      """WITH bins AS (SELECT s_suppkey, (s_suppkey % 10) * 5.0 AS lo,
        |  (s_suppkey % 10) * 5.0 + 7.0 AS hi FROM supplier)
        |SELECT p.p_partkey, p.p_size, b.s_suppkey, b.lo, b.hi
        |FROM part p FULL JOIN bins b ON p.p_size >= b.lo AND p.p_size <= b.hi""".stripMargin,
    "get_join_indices" ->
      """WITH bins AS (SELECT s_suppkey, (s_suppkey % 10) * 5.0 AS lo,
        |  (s_suppkey % 10) * 5.0 + 7.0 AS hi FROM supplier)
        |SELECT p.p_partkey, b.s_suppkey
        |FROM part p JOIN bins b ON p.p_size >= b.lo AND p.p_size <= b.hi""".stripMargin,
    "range_join" ->
      """WITH bins AS (SELECT s_suppkey, (s_suppkey % 10) * 5.0 AS lo,
        |  (s_suppkey % 10) * 5.0 + 7.0 AS hi FROM supplier)
        |SELECT b.s_suppkey, count(*) AS n
        |FROM lineitem l JOIN bins b ON l.l_quantity >= b.lo AND l.l_quantity <= b.hi
        |GROUP BY b.s_suppkey""".stripMargin,
    "asof_join" ->
      """WITH l AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'),
        |r AS (SELECT user_id, ts, max(value) AS click_value FROM events
        |      WHERE event_type = 'click' GROUP BY user_id, ts)
        |SELECT l.event_id, l.user_id, l.ts, r.click_value
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts""".stripMargin,
    "asof_join_global" ->
      """WITH l AS (SELECT event_id, ts FROM events WHERE event_type = 'view'),
        |r AS (SELECT ts, max(value) AS click_value FROM events
        |      WHERE event_type = 'click' GROUP BY ts)
        |SELECT l.event_id, l.ts, r.click_value
        |FROM l ASOF LEFT JOIN r ON l.ts >= r.ts""".stripMargin,
    // exhaustive per-left min-|distance| oracle (no ASOF nearest in DuckDB);
    // ORDER BY dist, fwd makes equal distances resolve backward (fwd = 0)
    "asof_join_nearest" ->
      """WITH l AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'),
        |r AS (SELECT user_id, ts, max(value) AS click_value FROM events
        |      WHERE event_type = 'click' GROUP BY user_id, ts),
        |cand AS (SELECT l.event_id, l.user_id, l.ts, r.click_value,
        |    abs(epoch(l.ts) - epoch(r.ts)) AS dist,
        |    CASE WHEN r.ts <= l.ts THEN 0 ELSE 1 END AS fwd
        |  FROM l LEFT JOIN r ON l.user_id = r.user_id)
        |SELECT event_id, user_id, ts, click_value FROM (
        |  SELECT *, row_number() OVER (PARTITION BY event_id
        |    ORDER BY dist NULLS LAST, fwd) AS rn FROM cand) WHERE rn = 1""".stripMargin,
    "asof_join_forward_tol" ->
      """WITH l AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'),
        |r AS (SELECT user_id, ts, max(value) AS click_value FROM events
        |      WHERE event_type = 'click' GROUP BY user_id, ts)
        |SELECT l.event_id, l.user_id, l.ts,
        |  CASE WHEN r.ts IS NOT NULL AND epoch(r.ts) - epoch(l.ts) <= 3600.0
        |       THEN r.click_value END AS click_value
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts <= r.ts""".stripMargin
  )
}
