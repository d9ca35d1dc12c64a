package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator coverage (SURVEY.md §2.4/2.5 join/agg/window/sort
  * families) over the driver's TPC-H-ish testdata, each with a DuckDB
  * oracle. Conventions for oracle parity:
  *  - every computed column aliased identically on both sides;
  *  - deterministic ORDER BY on both sides;
  *  - doubles rounded at the end (summation-order tolerance) via
  *    [[r2]]/floor on BOTH engines — Spark round() is decimal HALF_UP
  *    while DuckDB round() is binary, so they disagree at x.xx5
  *    boundaries (the t03 lesson); identical floor(x*100+0.5)/100
  *    double math cannot;
  *  - timestamps surfaced as 'yyyy-MM-dd' strings.
  *
  * Scale notes are per query; dimension joins broadcast, AQE handles
  * the rest.
  */
object RelationalQueries {

  /** 2-dp half-up rounding as pure double math (see conventions above). */
  private def r2(c: Column): Column = floor(c * 100 + 0.5) / 100

  private def t(dir: String, name: String)(implicit s: SparkSession): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  type Q = (SparkSession, String) => DataFrame

  /** Q1-family pricing summary: single wide scan, hash agg with map-side
    * partial aggregation; no join, one shuffle on a 6-value key.
    */
  private val q01: Q = (s, dir) => {
    implicit val sp = s
    t(dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        r2(sum(col("l_quantity"))).as("sum_qty"),
        r2(sum(col("l_extendedprice"))).as("sum_base_price"),
        r2(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** Star join: fact orders ⋈ broadcast customer ⋈ broadcast nation —
    * dims are broadcast so the fact table never shuffles.
    */
  private val q02: Q = (s, dir) => {
    implicit val sp = s
    val o = t(dir, "orders")
    val c = t(dir, "customer")
    val n = t(dir, "nation")
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(r2(sum("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))
      .orderBy("n_name")
  }

  /** Top-k: join + agg + global sort + limit (takeOrdered path). */
  private val q03: Q = (s, dir) => {
    implicit val sp = s
    val l = t(dir, "lineitem")
    val o = t(dir, "orders")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .filter(col("o_orderstatus") === "O")
      .groupBy(col("l_orderkey"))
      .agg(r2(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** Left-semi join (EXISTS): order-priority count for orders having at
    * least one lineitem shipped after the order in question.
    */
  private val q04: Q = (s, dir) => {
    implicit val sp = s
    val o = t(dir, "orders")
    val l = t(dir, "lineitem").filter(col("l_quantity") > 45)
    o.join(l, o("o_orderkey") === l("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  /** Left-anti join (NOT EXISTS): orders with no high-quantity lineitem,
    * by priority (predicate keeps the anti side non-empty at every SF).
    */
  private val q05: Q = (s, dir) => {
    implicit val sp = s
    val o = t(dir, "orders")
    val l = t(dir, "lineitem").filter(col("l_quantity") > 40)
    o.join(l, o("o_orderkey") === l("l_orderkey"), "left_anti")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")
  }

  /** Q6-family: tight scan-filter-agg; predicate + projection pushed to
    * the parquet scan (PushedFilters / 4-column ReadSchema).
    */
  private val q06: Q = (s, dir) => {
    implicit val sp = s
    t(dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1995-01-01") && col("l_shipdate") < lit("1996-01-01") &&
        col("l_discount").between(0.03, 0.07) && col("l_quantity") < 24)
      .agg(r2(sum(col("l_extendedprice") * col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_rows"))
  }

  /** Window functions: rank + running sum per customer (one shuffle on
    * o_custkey, both windows share the partitioning).
    */
  private val q07: Q = (s, dir) => {
    implicit val sp = s
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    t(dir, "orders")
      .withColumn("order_seq", row_number().over(w))
      .withColumn("running_spend",
        r2(sum(col("o_totalprice")).over(w.rowsBetween(Window.unboundedPreceding, 0))))
      .filter(col("order_seq") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("order_seq"), col("running_spend"))
      .orderBy("o_custkey", "order_seq")
  }

  /** Distinct aggregates: exact countDistinct (two-phase) per brand. */
  private val q08: Q = (s, dir) => {
    implicit val sp = s
    val l = t(dir, "lineitem")
    val p = t(dir, "part")
    l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(countDistinct(col("l_suppkey")).as("n_suppliers"),
        countDistinct(col("l_orderkey")).as("n_orders"))
      .orderBy("p_brand")
  }

  /** Conditional pivot via CASE aggregation (portable to ANSI SQL). */
  private val q09: Q = (s, dir) => {
    implicit val sp = s
    t(dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        r2(sum(when(col("o_orderstatus") === "O", col("o_totalprice")).otherwise(0.0))).as("open_total"),
        r2(sum(when(col("o_orderstatus") === "F", col("o_totalprice")).otherwise(0.0))).as("filled_total"),
        r2(sum(when(col("o_orderstatus") === "P", col("o_totalprice")).otherwise(0.0))).as("partial_total"))
      .orderBy("o_orderpriority")
  }

  /** Set operations: high-balance ∪ low-balance suppliers minus mid-band
    * (UNION / EXCEPT keep set semantics on both engines).
    */
  private val q10: Q = (s, dir) => {
    implicit val sp = s
    val su = t(dir, "supplier")
    val hi = su.filter(col("s_acctbal") > 7000).select("s_nationkey")
    val lo = su.filter(col("s_acctbal") < 1000).select("s_nationkey")
    val mid = su.filter(col("s_acctbal").between(4000, 5000)).select("s_nationkey")
    hi.union(lo).except(mid).orderBy("s_nationkey")
  }

  /** JSON + time bucketing: parse events.props, hourly rollup. */
  private val q11: Q = (s, dir) => {
    implicit val sp = s
    t(dir, "events")
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy(date_format(col("ts"), "yyyy-MM-dd HH:00:00").as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), r2(sum("value")).as("v"), r2(avg("k")).as("avg_k"))
      .orderBy("hour", "event_type")
  }

  /** lag window: inter-event gap seconds per user (sessionization seed). */
  private val q12: Q = (s, dir) => {
    implicit val sp = s
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    t(dir, "events")
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      // ts is TIMESTAMP_NTZ; session TZ is UTC so the cast is identity
      .withColumn("gap_us", unix_micros(col("ts").cast("timestamp")) -
        unix_micros(col("prev_ts").cast("timestamp")))
      .filter(col("gap_us").isNotNull)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_gaps"), max("gap_us").as("max_gap_us"))
      .orderBy("user_id")
  }

  /** ROLLUP grouping sets over returnflag/linestatus. */
  private val q13: Q = (s, dir) => {
    implicit val sp = s
    t(dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(r2(sum("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
  }

  /** CUBE grouping sets over status × priority (all 4 combinations). */
  private val q14: Q = (s, dir) => {
    implicit val sp = s
    t(dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(r2(sum("o_totalprice")).as("total"), count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
  }

  /** As-of join: for each click event, the latest strictly-earlier
    * purchase by the same user. Implemented the scale-safe way — union
    * both sides tagged, one window over (user_id, ts) — a single shuffle
    * and no row explosion, vs. the naive join+filter+argmax which
    * materializes every (click × earlier purchase) pair. At equal ts the
    * click sorts before the purchase (kind asc), giving strict `<`
    * semantics; DuckDB's native ASOF JOIN is the oracle.
    */
  private val q15: Q = (s, dir) => {
    implicit val sp = s
    val ev = t(dir, "events").filter(col("user_id").isNotNull)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"), lit(0).as("kind"),
        lit(null).cast("double").as("p_value"))
    // one purchase row per (user, ts): equal-timestamp purchases are an
    // unspecified-tie case in ASOF joins (engines disagree on the winner),
    // so both sides of the oracle resolve ties to max(value) up front;
    // NULL user keys are excluded on both sides (SQL joins reject
    // NULL = NULL, a window PARTITION BY groups NULLs together)
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("value")).as("p_value"))
      .select(col("user_id"), col("ts"), lit(null).cast("long").as("event_id"),
        lit(1).as("kind"), col("p_value"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("kind"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    clicks.unionByName(purchases)
      // ONE tracked struct, not two independent ignoreNulls windows: with
      // separate trackers a purchase whose max(value) is NULL would leave
      // purchase_value pointing at an OLDER purchase while purchase_us
      // points at the newer one — an inconsistent pair the ASOF oracle
      // never produces (it returns the newest purchase's NULL value)
      .withColumn("p",
        last(when(col("kind") === 1,
            struct(unix_micros(col("ts").cast("timestamp")).as("us"), col("p_value"))),
          ignoreNulls = true).over(w))
      .filter(col("kind") === 0 && col("p").isNotNull)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("click_us"),
        col("p.us").as("purchase_us"), col("p.p_value").as("purchase_value"))
      .orderBy("event_id")
  }

  /** Skew-safe salted join (exec.SkewSafeJoin) under the value oracle:
    * events (potentially hot user keys) ⋈ customer with the probe side
    * salted and the build side replicated across the salt domain — the
    * result must equal the plain equi join bit-for-bit.
    */
  private val q16: Q = (s, dir) => {
    implicit val sp = s
    val e = t(dir, "events").select(col("user_id"), col("value"))
    val c = t(dir, "customer")
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    graft.exec.SkewSafeJoin.join(e, c, "user_id", saltBuckets = 8)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_events"), r2(sum("value")).as("total_value"))
      .orderBy("c_mktsegment")
  }

  /** Gap-based sessionization, batch form (6 h gap) — the DuckDB-checked
    * twin of the flatMapGroupsWithState streaming operator
    * (graft.streaming.Sessionize; parity in SessionizeSpec).
    */
  private val q17: Q = (s, dir) => {
    implicit val sp = s
    graft.streaming.Sessionize.sessionizeBatch(t(dir, "events"), 6L * 3600 * 1000000)
      .orderBy("user_id", "session_start_us")
  }

  /** Interval (range) join, batch form of the stream-stream attribution
    * join (graft.streaming.StreamJoin; stream/batch parity in
    * StreamJoinSpec): every purchase within the hour before a click.
    */
  private val q18: Q = (s, dir) => {
    implicit val sp = s
    val ev = t(dir, "events")
    graft.streaming.StreamJoin.attributionJoin(
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "purchase"),
        watermark = None)
      .orderBy("click_id", "purchase_us", "purchase_value")
  }

  val all: Map[String, Q] = Map(
    "q01_pricing_agg" -> q01,
    "q02_revenue_by_nation" -> q02,
    "q03_top_orders" -> q03,
    "q04_semi_join_priority" -> q04,
    "q05_anti_join_orders" -> q05,
    "q06_filter_pushdown_agg" -> q06,
    "q07_window_running" -> q07,
    "q08_distinct_agg" -> q08,
    "q09_case_pivot" -> q09,
    "q10_set_ops" -> q10,
    "q11_events_json_hourly" -> q11,
    "q12_event_gaps" -> q12,
    "q13_rollup" -> q13,
    "q14_cube" -> q14,
    "q15_asof_join" -> q15,
    "q16_salted_join" -> q16,
    "q17_sessionize" -> q17,
    "q18_interval_join" -> q18)

  val oracle: Map[String, String] = Map(
    "q01_pricing_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  floor((sum(l_quantity)) * 100 + 0.5) / 100 AS sum_qty,
        |  floor((sum(l_extendedprice)) * 100 + 0.5) / 100 AS sum_base_price,
        |  floor((sum(l_extendedprice * (1 - l_discount))) * 100 + 0.5) / 100 AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q02_revenue_by_nation" ->
      """SELECT n_name, floor((sum(o_totalprice)) * 100 + 0.5) / 100 AS revenue, count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q03_top_orders" ->
      """SELECT l_orderkey, floor((sum(l_extendedprice * (1 - l_discount))) * 100 + 0.5) / 100 AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderstatus = 'O'
        |GROUP BY 1 ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q04_semi_join_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders WHERE EXISTS (
        |  SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q05_anti_join_orders" ->
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders WHERE NOT EXISTS (
        |  SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 40)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q06_filter_pushdown_agg" ->
      """SELECT floor((sum(l_extendedprice * l_discount)) * 100 + 0.5) / 100 AS revenue, count(*) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
        |  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q07_window_running" ->
      """SELECT o_custkey, o_orderkey, order_seq, running_spend FROM (
        |  SELECT o_custkey, o_orderkey,
        |    row_number() OVER w AS order_seq,
        |    floor((sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) * 100 + 0.5) / 100 AS running_spend
        |  FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey))
        |WHERE order_seq <= 3 ORDER BY o_custkey, order_seq""".stripMargin,
    "q08_distinct_agg" ->
      """SELECT p_brand, count(DISTINCT l_suppkey) AS n_suppliers,
        |  count(DISTINCT l_orderkey) AS n_orders
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q09_case_pivot" ->
      """SELECT o_orderpriority,
        |  floor((sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0 END)) * 100 + 0.5) / 100 AS open_total,
        |  floor((sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END)) * 100 + 0.5) / 100 AS filled_total,
        |  floor((sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice ELSE 0 END)) * 100 + 0.5) / 100 AS partial_total
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q10_set_ops" ->
      """(SELECT s_nationkey FROM supplier WHERE s_acctbal > 7000
        | UNION
        | SELECT s_nationkey FROM supplier WHERE s_acctbal < 1000)
        |EXCEPT
        |SELECT s_nationkey FROM supplier WHERE s_acctbal BETWEEN 4000 AND 5000
        |ORDER BY s_nationkey""".stripMargin,
    "q11_events_json_hourly" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour, event_type,
        |  count(*) AS n, floor((sum(value)) * 100 + 0.5) / 100 AS v,
        |  floor((avg(CAST(json_extract_string(props, '$.k') AS INT))) * 100 + 0.5) / 100 AS avg_k
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q12_event_gaps" ->
      """SELECT user_id, count(*) AS n_gaps, max(gap_us) AS max_gap_us FROM (
        |  SELECT user_id,
        |    epoch_us(ts) - epoch_us(lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
        |  FROM events)
        |WHERE gap_us IS NOT NULL GROUP BY 1 ORDER BY 1""".stripMargin,
    "q13_rollup" ->
      """SELECT l_returnflag, l_linestatus, floor((sum(l_quantity)) * 100 + 0.5) / 100 AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    "q14_cube" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  floor((sum(o_totalprice)) * 100 + 0.5) / 100 AS total, count(*) AS n
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    "q15_asof_join" ->
      """WITH clicks AS (
        |  SELECT event_id, user_id, ts FROM events
        |  WHERE event_type = 'click' AND user_id IS NOT NULL),
        |purch AS (
        |  SELECT user_id, ts, max(value) AS value FROM events
        |  WHERE event_type = 'purchase' AND user_id IS NOT NULL
        |  GROUP BY user_id, ts)
        |SELECT c.event_id, c.user_id,
        |  epoch_us(c.ts) AS click_us, epoch_us(p.ts) AS purchase_us,
        |  p.value AS purchase_value
        |FROM clicks c ASOF JOIN purch p
        |  ON c.user_id = p.user_id AND c.ts > p.ts
        |ORDER BY c.event_id""".stripMargin,
    "q16_salted_join" ->
      """SELECT c_mktsegment, count(*) AS n_events, floor((sum(value)) * 100 + 0.5) / 100 AS total_value
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q17_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS us, value FROM events
        |  WHERE user_id IS NOT NULL),
        |g AS (
        |  SELECT user_id, us, value,
        |    CASE WHEN lag(us) OVER win IS NULL OR us - lag(us) OVER win > 21600000000
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM e WINDOW win AS (PARTITION BY user_id ORDER BY us, value)),
        |s AS (
        |  SELECT user_id, us, value,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY us, value
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM g)
        |SELECT user_id, min(us) AS session_start_us, max(us) AS session_end_us,
        |  count(*) AS n_events, floor(sum(value) * 100 + 0.5) / 100 AS total_value
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id NULLS FIRST, session_start_us NULLS FIRST""".stripMargin,
    "q18_interval_join" ->
      """SELECT c.event_id AS click_id, c.user_id,
        |  epoch_us(c.ts) AS click_us, epoch_us(p.ts) AS purchase_us,
        |  p.value AS purchase_value
        |FROM events c JOIN events p
        |  ON c.user_id = p.user_id
        |  AND p.ts BETWEEN c.ts - INTERVAL 1 HOUR AND c.ts
        |WHERE c.event_type = 'click' AND p.event_type = 'purchase'
        |ORDER BY click_id, purchase_us, purchase_value""".stripMargin)
}
