package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch analytics over the driver's TPC-H-ish tables — the relational
  * operator surface (agg / join / window / sort-limit / set-op / semi-anti)
  * with DuckDB oracles. These are scale-designed: filters + projections sit
  * directly on the parquet scan (pushdown), small dims are broadcast, and
  * aggregates are partial-agg friendly (no driver-side collects).
  */
object RelationalQueries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Exact decimal accumulation for double measures: double sums are
    * addition-order dependent (partition count changes the result), so
    * every oracled sum goes through decimal(38,4) — bit-identical on both
    * engines at any parallelism — and is cast back to double for a
    * schema-stable output. */
  private def dsum(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sum(c.cast("decimal(38,4)"))
  private def dround(c: org.apache.spark.sql.Column, s: Int = 2): org.apache.spark.sql.Column =
    round(c, s).cast("double")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1-style pricing summary: map-side partial agg, 2-col shuffle key.
    "q1_pricing_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dround(dsum(col("l_quantity"))).as("sum_qty"),
          dround(dsum(col("l_extendedprice"))).as("sum_base_price"),
          dround(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // Broadcast-join chain: orders ⋈ customer ⋈ nation (both dims tiny ⇒
    // broadcast, no shuffle on the fact side beyond the final agg).
    "q2_revenue_by_nation" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val customer = t(s, dir, "customer")
      val nation = t(s, dir, "nation")
      orders
        .join(broadcast(customer), orders("o_custkey") === customer("c_custkey"))
        .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(dround(dsum(col("o_totalprice"))).as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy("n_name")
    }),

    // Top-k: global sort avoided — TakeOrderedAndProject handles limit+order.
    "q3_topk_orders" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice"), 2).as("price"))
        .orderBy(col("price").desc, col("o_orderkey"))
        .limit(10)
    }),

    // Offset/limit paging (L3 — the reference testserver's offset-slice
    // pagination, /root/reference/testserver/main.go:243-257): page 2 of
    // the price-ordered scan. Spark plans OFFSET+LIMIT as a single
    // CollectLimit with offset — no global sort materialization.
    "q14_offset_page" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("price"))
        .orderBy(col("price").desc, col("o_orderkey"))
        .offset(10).limit(10)
    }),

    // Window functions: per-customer order ranking + running revenue.
    "q4_window_rank" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .withColumn("running_spend",
          dround(sum(col("o_totalprice").cast("decimal(38,4)")).over(
            w.rowsBetween(Window.unboundedPreceding, 0))))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("running_spend"))
        .orderBy("o_custkey", "rn")
    }),

    // Event-time tumbling window over the events stream table (batch form).
    "q5_event_tumbling" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), dround(dsum(col("value"))).as("sum_value"))
        .select(unix_timestamp(col("window.start")).as("w_start"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy("w_start", "event_type")
    }),

    // Semi/anti joins: segment customers by order existence.
    "q6_semi_anti" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      val withO = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_mktsegment")).groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n")).withColumn("kind", lit("with_orders"))
      val noO = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_mktsegment")).groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n")).withColumn("kind", lit("without_orders"))
      withO.unionByName(noO).orderBy("kind", "c_mktsegment")
    }),

    // Set ops: brands selling large parts vs small parts.
    "q7_setops" -> ((s, dir) => {
      val p = t(s, dir, "part")
      val large = p.filter(col("p_size") >= 40).select("p_brand").distinct()
      val small = p.filter(col("p_size") <= 10).select("p_brand").distinct()
      large.intersect(small).withColumn("op", lit("both"))
        .unionByName(large.except(small).withColumn("op", lit("large_only")))
        .orderBy("op", "p_brand")
    }),

    // JSON column parsing (the reference's to_json/from_json storage
    // boundary, scrape.go:590 / encoders.go:257-262).
    "q9_json_props" -> ((s, dir) => {
      t(s, dir, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy("event_type")
    }),

    // Correlated aggregate (orders above the customer's own average) —
    // expressed shuffle-once via a window, with exact decimal arithmetic
    // (price * n > sum avoids engine-dependent double averaging).
    "q10_above_cust_avg" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
      t(s, dir, "orders")
        .withColumn("sum_p", sum(col("o_totalprice").cast("decimal(38,4)")).over(w))
        .withColumn("n_p", count(lit(1)).over(w))
        .filter(col("o_totalprice").cast("decimal(38,4)") * col("n_p") > col("sum_p"))
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_above"))
        .orderBy("o_custkey")
    }),

    // Temporal bucketing: calendar-month revenue rollup (date_trunc +
    // extract; partition-pruning-shaped predicate on the scan).
    "q12_monthly_revenue" -> ((s, dir) => {
      t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp"))
        .groupBy(date_trunc("month", col("o_orderdate")).as("month"),
          col("o_orderstatus"))
        .agg(dround(dsum(col("o_totalprice"))).as("revenue"),
          count(lit(1)).as("n_orders"))
        .select(unix_timestamp(col("month")).as("month_start"),
          col("o_orderstatus"), col("revenue"), col("n_orders"))
        .orderBy("month_start", "o_orderstatus")
    }),

    // Exact interpolated percentiles (order statistics — deterministic at
    // any parallelism, unlike double sums).
    "q11_percentiles" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(percentile(col("o_totalprice"), lit(0.5)).as("p50"),
          percentile(col("o_totalprice"), lit(0.9)).as("p90"),
          count(lit(1)).as("n"))
        .orderBy("o_orderpriority")
    }),

    // AS-OF join via the custom Catalyst operator (AsOfJoinPlan ->
    // AsOfJoinStrategy -> AsOfJoinExec merge sweep): for every click, the
    // latest 'view' by the same user at-or-before the click. Oracled with
    // DuckDB's native ASOF JOIN.
    "q13_asof_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("event_id").as("v_event_id"), col("user_id").as("v_user_id"),
          col("ts").as("v_ts"))
      graft.plans.AsOfJoin(clicks, views, "user_id", "v_user_id", "ts", "v_ts",
          rightTieBreakCol = Some("v_event_id"))
        .select(col("event_id"), col("user_id"), col("v_event_id"))
        .orderBy("event_id")
    }),

    // Multi-way join + grouped agg with date bucketing (shuffle on 1 key).
    "q8_supplier_part" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val sup = t(s, dir, "supplier")
      li.join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(dround(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"),
          dround(dsum(col("l_quantity"))).as("sum_qty"),
          countDistinct(col("l_orderkey")).as("n_orders"))
        .orderBy("s_name")
    }))

  val oracleSql: Map[String, String] = Map(
    "q1_pricing_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(CAST(l_quantity AS DECIMAL(38,4))), 2)::DOUBLE AS sum_qty,
        |  round(sum(CAST(l_extendedprice AS DECIMAL(38,4))), 2)::DOUBLE AS sum_base_price,
        |  round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,4))), 2)::DOUBLE AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q2_revenue_by_nation" ->
      """SELECT n_name, round(sum(CAST(o_totalprice AS DECIMAL(38,4))), 2)::DOUBLE AS revenue, count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q3_topk_orders" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
        |FROM orders ORDER BY price DESC, o_orderkey LIMIT 10""".stripMargin,
    "q4_window_rank" ->
      """SELECT o_custkey, rn, o_orderkey, running_spend FROM (
        |  SELECT o_custkey, o_orderkey,
        |    row_number() OVER w AS rn,
        |    round(sum(CAST(o_totalprice AS DECIMAL(38,4))) OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate, o_orderkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)::DOUBLE AS running_spend
        |  FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |) WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "q5_event_tumbling" ->
      """SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS w_start,
        |  event_type, count(*) AS n, round(sum(CAST(value AS DECIMAL(38,4))), 2)::DOUBLE AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q6_semi_anti" ->
      """SELECT c_mktsegment, count(*) AS n, 'with_orders' AS kind FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY 1
        |UNION ALL
        |SELECT c_mktsegment, count(*) AS n, 'without_orders' AS kind FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY 1
        |ORDER BY kind, c_mktsegment""".stripMargin,
    "q7_setops" ->
      """WITH large AS (SELECT DISTINCT p_brand FROM part WHERE p_size >= 40),
        |     small AS (SELECT DISTINCT p_brand FROM part WHERE p_size <= 10)
        |SELECT p_brand, 'both' AS op FROM (SELECT * FROM large INTERSECT SELECT * FROM small)
        |UNION ALL
        |SELECT p_brand, 'large_only' AS op FROM (SELECT * FROM large EXCEPT SELECT * FROM small)
        |ORDER BY op, p_brand""".stripMargin,
    "q12_monthly_revenue" ->
      """SELECT CAST(epoch(date_trunc('month', o_orderdate)) AS BIGINT) AS month_start,
        |  o_orderstatus,
        |  round(sum(CAST(o_totalprice AS DECIMAL(38,4))), 2)::DOUBLE AS revenue,
        |  count(*) AS n_orders
        |FROM orders WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q11_percentiles" ->
      """SELECT o_orderpriority,
        |  quantile_cont(o_totalprice, 0.5) AS p50,
        |  quantile_cont(o_totalprice, 0.9) AS p90,
        |  count(*) AS n
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q10_above_cust_avg" ->
      """SELECT o_custkey, count(*) AS n_above FROM (
        |  SELECT o_custkey, o_totalprice,
        |    sum(CAST(o_totalprice AS DECIMAL(38,4))) OVER (PARTITION BY o_custkey) AS sum_p,
        |    count(*) OVER (PARTITION BY o_custkey) AS n_p
        |  FROM orders)
        |WHERE CAST(o_totalprice AS DECIMAL(38,4)) * n_p > sum_p
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q9_json_props" ->
      """SELECT event_type,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  count(*) AS n,
        |  min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q14_offset_page" ->
      """SELECT o_orderkey, round(o_totalprice, 2) AS price
        |FROM orders ORDER BY price DESC, o_orderkey LIMIT 10 OFFSET 10""".stripMargin,
    "q13_asof_join" ->
      // window formulation rather than DuckDB's native ASOF JOIN: it pins
      // the tie rule (greatest v_ts, then greatest v_event_id) that the
      // engine's rightTieBreakCol enforces; native ASOF leaves (key, time)
      // ties unspecified on both engines
      """SELECT event_id, user_id, v_event_id FROM (
        |  SELECT l.event_id, l.user_id, r.event_id AS v_event_id,
        |    row_number() OVER (PARTITION BY l.event_id
        |                       ORDER BY r.ts DESC, r.event_id DESC) AS rn
        |  FROM (SELECT * FROM events WHERE event_type = 'click') l
        |  JOIN (SELECT * FROM events WHERE event_type = 'view') r
        |    ON l.user_id = r.user_id AND r.ts <= l.ts)
        |WHERE rn = 1 ORDER BY event_id""".stripMargin,
    "q8_supplier_part" ->
      """SELECT s_name,
        |  round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,4))), 2)::DOUBLE AS revenue,
        |  round(sum(CAST(l_quantity AS DECIMAL(38,4))), 2)::DOUBLE AS sum_qty,
        |  count(DISTINCT l_orderkey) AS n_orders
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY 1 ORDER BY 1""".stripMargin)
}
