package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Relational operator inventory (SURVEY.md §2.6): joins of every type,
  * aggregation/rollup/cube/grouping-sets, window functions, sorts/top-k,
  * set ops, scalar function families, sketches. Every query here has a
  * DuckDB oracle in [[SparkEntry.oracleSql]].
  *
  * Cross-engine determinism rules (the driver hash-compares values):
  *  - counts / integral sums → BIGINT on both sides;
  *  - money sums → cast the *term* to DECIMAL(18,2) before SUM (exact
  *    decimal arithmetic in both engines, no float-order sensitivity);
  *  - ratios/averages → compute from exact sums with one double division,
  *    then ROUND (IEEE division of identical inputs is bit-identical);
  *  - raw column passthrough (no arithmetic) is safe at any type;
  *  - never output an un-rounded float aggregate.
  */
object RelationalQueries {
  import Registry.Q

  private def money(c: Column): Column = c.cast(DecimalType(18, 2))

  val all: Seq[Q] = Seq(
    // --- Aggregation -----------------------------------------------------
    Q("q01_pricing_summary",
      (spark, dir) => {
        val li = Tables.load(spark, dir, "lineitem")
        li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(col("l_quantity").cast("bigint")).as("sum_qty"),
            sum(money(col("l_extendedprice"))).cast("double").as("sum_base_price"),
            sum(money(col("l_extendedprice")) * (lit(1) - money(col("l_discount"))))
              .cast("double").as("sum_disc_price"),
            round(sum(col("l_quantity")).cast("double") / count(lit(1)), 4).as("avg_qty"),
            count(lit(1)).as("count_order"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
             |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
             |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
             |ROUND(CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / COUNT(*), 4) AS avg_qty,
             |COUNT(*) AS count_order
             |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
             |GROUP BY l_returnflag, l_linestatus""".stripMargin)),

    // --- Filter + sort + limit (pushdown, top-k global) ------------------
    Q("q02_filter_topk",
      (spark, dir) => {
        val li = Tables.load(spark, dir, "lineitem")
        li.filter(col("l_shipdate") >= lit("1999-01-01").cast("timestamp") &&
            col("l_discount") > 0.05)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
          .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
          .limit(100)
      },
      Some("""SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1999-01-01' AND l_discount > 0.05
             |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100""".stripMargin)),

    // --- Multi-way inner join + agg (broadcast dims) ---------------------
    Q("q03_join_revenue",
      (spark, dir) => {
        val li = Tables.load(spark, dir, "lineitem")
        val o = Tables.load(spark, dir, "orders")
        val c = Tables.load(spark, dir, "customer")
        val n = Tables.load(spark, dir, "nation")
        li.join(o, li("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .groupBy(col("n_name"), year(col("o_orderdate")).as("o_year"))
          .agg(sum(money(col("l_extendedprice")) * (lit(1) - money(col("l_discount"))))
            .cast("double").as("revenue"),
            count(lit(1)).as("n_items"))
      },
      Some("""SELECT n_name, CAST(year(o_orderdate) AS INT) AS o_year,
             |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
             |COUNT(*) AS n_items
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |GROUP BY n_name, year(o_orderdate)""".stripMargin)),

    // --- Left outer join + null-aware counting ---------------------------
    Q("q04_left_join",
      (spark, dir) => {
        val c = Tables.load(spark, dir, "customer")
        val o = Tables.load(spark, dir, "orders")
        c.join(o, c("c_custkey") === o("o_custkey"), "left")
          .groupBy(col("c_nationkey"))
          .agg(count(lit(1)).as("n_rows"),
            count(col("o_orderkey")).as("n_orders"),
            sum(money(col("o_totalprice"))).cast("double").as("total_price"))
      },
      Some("""SELECT c_nationkey, COUNT(*) AS n_rows, COUNT(o_orderkey) AS n_orders,
             |CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
             |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
             |GROUP BY c_nationkey""".stripMargin)),

    // --- Full outer join of two aggregates -------------------------------
    Q("q05_full_outer_join",
      (spark, dir) => {
        val c = Tables.load(spark, dir, "customer")
        val s = Tables.load(spark, dir, "supplier")
        val ca = c.groupBy(col("c_nationkey").as("nationkey"))
          .agg(count(lit(1)).as("n_customers"))
        val sa = s.groupBy(col("s_nationkey").as("nationkey"))
          .agg(count(lit(1)).as("n_suppliers"))
        ca.join(sa, Seq("nationkey"), "full")
          .select(col("nationkey"),
            coalesce(col("n_customers"), lit(0L)).as("n_customers"),
            coalesce(col("n_suppliers"), lit(0L)).as("n_suppliers"))
      },
      Some("""SELECT COALESCE(ca.nationkey, sa.nationkey) AS nationkey,
             |COALESCE(n_customers, 0) AS n_customers, COALESCE(n_suppliers, 0) AS n_suppliers
             |FROM (SELECT c_nationkey AS nationkey, COUNT(*) AS n_customers FROM customer GROUP BY 1) ca
             |FULL JOIN (SELECT s_nationkey AS nationkey, COUNT(*) AS n_suppliers FROM supplier GROUP BY 1) sa
             |USING (nationkey)""".stripMargin)),

    // --- Semi + anti joins ------------------------------------------------
    Q("q06_semi_anti_join",
      (spark, dir) => {
        val c = Tables.load(spark, dir, "customer")
        val o = Tables.load(spark, dir, "orders")
        val okeys = o.select(col("o_custkey"))
        val withOrders = c.join(okeys, c("c_custkey") === okeys("o_custkey"), "left_semi")
          .select(lit("has_orders").as("bucket"), col("c_custkey"))
        val without = c.join(okeys, c("c_custkey") === okeys("o_custkey"), "left_anti")
          .select(lit("no_orders").as("bucket"), col("c_custkey"))
        withOrders.unionAll(without)
          .groupBy(col("bucket")).agg(count(lit(1)).as("n"),
            sum(col("c_custkey")).as("key_sum"))
      },
      Some("""WITH tagged AS (
             |  SELECT 'has_orders' AS bucket, c_custkey FROM customer
             |  WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |  UNION ALL
             |  SELECT 'no_orders' AS bucket, c_custkey FROM customer
             |  WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey))
             |SELECT bucket, COUNT(*) AS n, CAST(SUM(c_custkey) AS BIGINT) AS key_sum
             |FROM tagged GROUP BY bucket""".stripMargin)),

    // --- Equi join + range predicate (interval self-join, scalable) ------
    Q("q07_interval_self_join",
      (spark, dir) => {
        val e = Tables.load(spark, dir, "events")
        val a = e.select(col("user_id"), col("ts").as("ts_a"), col("event_id").as("id_a"))
        val b = e.select(col("user_id"), col("ts").as("ts_b"), col("event_id").as("id_b"))
        // equi key user_id keeps this a hash join; the time predicate is a
        // post-join filter — scales as sum of per-user group sizes, not n².
        a.join(b, Seq("user_id"))
          .filter(col("ts_b") > col("ts_a") &&
            col("ts_b") <= col("ts_a") + expr("INTERVAL 5 MINUTES"))
          .groupBy(col("user_id")).agg(count(lit(1)).as("pair_cnt"))
      },
      Some("""SELECT a.user_id AS user_id, COUNT(*) AS pair_cnt
             |FROM events a JOIN events b ON a.user_id = b.user_id
             |AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 5 MINUTE
             |GROUP BY a.user_id""".stripMargin)),

    // --- Rollup ----------------------------------------------------------
    Q("q08_rollup",
      (spark, dir) => {
        val o = Tables.load(spark, dir, "orders")
        o.rollup(year(col("o_orderdate")).as("o_year"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n_orders"),
            sum(money(col("o_totalprice"))).cast("double").as("total"))
      },
      Some("""SELECT CAST(year(o_orderdate) AS INT) AS o_year, o_orderpriority,
             |COUNT(*) AS n_orders, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
             |FROM orders GROUP BY ROLLUP (year(o_orderdate), o_orderpriority)""".stripMargin)),

    // --- Cube ------------------------------------------------------------
    Q("q09_cube",
      (spark, dir) => {
        val li = Tables.load(spark, dir, "lineitem")
        li.cube(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n"), sum(col("l_quantity").cast("bigint")).as("qty"))
      },
      Some("""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
             |CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
             |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin)),

    // --- Grouping sets (SQL surface) -------------------------------------
    Q("q10_grouping_sets",
      (spark, dir) => {
        Tables.registerViews(spark, dir)
        spark.sql(
          """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
            |FROM orders
            |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin)
      },
      Some("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
             |FROM orders
             |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin)),

    // --- Window: ranking with unique ordering ----------------------------
    Q("q11_window_topk_per_group",
      (spark, dir) => {
        val c = Tables.load(spark, dir, "customer")
        val w = Window.partitionBy(col("c_nationkey"))
          .orderBy(col("c_acctbal").desc, col("c_custkey"))
        c.select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"),
            row_number().over(w).as("rn"))
          .filter(col("rn") <= 3)
      },
      Some("""SELECT c_nationkey, c_custkey, c_acctbal, CAST(rn AS BIGINT) AS rn FROM (
             |  SELECT c_nationkey, c_custkey, c_acctbal,
             |    ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rn
             |  FROM customer) t WHERE rn <= 3""".stripMargin)),

    // --- Window: rank/dense_rank with real ties --------------------------
    Q("q12_window_rank_ties",
      (spark, dir) => {
        val li = Tables.load(spark, dir, "lineitem")
        val w = Window.partitionBy(col("l_suppkey")).orderBy(col("l_quantity").desc)
        li.select(col("l_suppkey"), col("l_quantity").cast("bigint").as("qty"),
            rank().over(w).as("rnk"), dense_rank().over(w).as("drnk"))
          .filter(col("rnk") <= 2)
          .groupBy(col("l_suppkey"))
          .agg(count(lit(1)).as("n_top"), max(col("qty")).as("max_qty"),
            max(col("drnk")).as("max_drnk"))
      },
      Some("""SELECT l_suppkey, COUNT(*) AS n_top, CAST(MAX(qty) AS BIGINT) AS max_qty,
             |CAST(MAX(drnk) AS BIGINT) AS max_drnk FROM (
             |  SELECT l_suppkey, CAST(l_quantity AS BIGINT) AS qty,
             |    RANK() OVER (PARTITION BY l_suppkey ORDER BY l_quantity DESC) AS rnk,
             |    DENSE_RANK() OVER (PARTITION BY l_suppkey ORDER BY l_quantity DESC) AS drnk
             |  FROM lineitem) t WHERE rnk <= 2 GROUP BY l_suppkey""".stripMargin)),

    // --- Window: lag/lead + running decimal sum --------------------------
    Q("q13_window_running",
      (spark, dir) => {
        val e = Tables.load(spark, dir, "events")
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        e.select(col("user_id"), col("event_id"), col("value"),
            lag(col("event_id"), 1).over(w).as("prev_event"),
            lead(col("event_id"), 1).over(w).as("next_event"),
            sum(money(col("value"))).over(
              w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
              .cast("double").as("running_value"),
            (unix_millis(col("ts")) - unix_millis(lag(col("ts"), 1).over(w))).as("ms_since_prev"))
          .filter(col("user_id") < 5)
      },
      Some("""SELECT user_id, event_id, value,
             |  LAG(event_id) OVER w AS prev_event,
             |  LEAD(event_id) OVER w AS next_event,
             |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value,
             |  epoch_ms(ts) - epoch_ms(LAG(ts) OVER w) AS ms_since_prev
             |FROM events WHERE user_id < 5
             |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin)),

    // --- Set operations ---------------------------------------------------
    Q("q14_set_ops",
      (spark, dir) => {
        val c = Tables.load(spark, dir, "customer").select(col("c_nationkey").as("nationkey"))
        val s = Tables.load(spark, dir, "supplier").select(col("s_nationkey").as("nationkey"))
        val i = c.intersect(s).select(lit("both").as("op"), col("nationkey"))
        val e = c.except(s).select(lit("cust_only").as("op"), col("nationkey"))
        val u = c.union(s).distinct().select(lit("either").as("op"), col("nationkey"))
        i.unionAll(e).unionAll(u)
      },
      Some("""SELECT 'both' AS op, nationkey FROM
             |  (SELECT c_nationkey AS nationkey FROM customer INTERSECT SELECT s_nationkey FROM supplier)
             |UNION ALL SELECT 'cust_only', nationkey FROM
             |  (SELECT c_nationkey AS nationkey FROM customer EXCEPT SELECT s_nationkey FROM supplier)
             |UNION ALL SELECT 'either', nationkey FROM
             |  (SELECT c_nationkey AS nationkey FROM customer UNION SELECT s_nationkey FROM supplier)""".stripMargin)),

    // --- Distinct aggregation --------------------------------------------
    Q("q15_distinct_agg",
      (spark, dir) => {
        val c = Tables.load(spark, dir, "customer")
        c.groupBy(col("c_mktsegment"))
          .agg(countDistinct(col("c_nationkey")).as("n_nations"),
            count(lit(1)).as("n_customers"),
            sum(money(col("c_acctbal"))).cast("double").as("total_bal"))
      },
      Some("""SELECT c_mktsegment, COUNT(DISTINCT c_nationkey) AS n_nations,
             |COUNT(*) AS n_customers, CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
             |FROM customer GROUP BY c_mktsegment""".stripMargin)),

    // --- String function family ------------------------------------------
    Q("q16_string_funcs",
      (spark, dir) => {
        val p = Tables.load(spark, dir, "part")
        p.select(
            col("p_partkey"),
            lower(col("p_type")).as("type_lower"),
            upper(col("p_brand")).as("brand_upper"),
            substring(col("p_name"), 1, 8).as("name_prefix"),
            length(col("p_name")).as("name_len"),
            regexp_extract(col("p_brand"), "Brand#(\\d+)", 1).cast("int").as("brand_num"),
            regexp_replace(col("p_type"), "[AEIOU]", "_").as("type_devowel"),
            concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
            lpad(col("p_size").cast("string"), 4, "0").as("size_padded"),
            trim(col("p_name")).as("name_trim"))
          .filter(col("p_partkey") % 7 === 0)
      },
      Some("""SELECT p_partkey, lower(p_type) AS type_lower, upper(p_brand) AS brand_upper,
             |substring(p_name, 1, 8) AS name_prefix, CAST(length(p_name) AS INT) AS name_len,
             |CAST(regexp_extract(p_brand, 'Brand#(\d+)', 1) AS INT) AS brand_num,
             |regexp_replace(p_type, '[AEIOU]', '_', 'g') AS type_devowel,
             |concat_ws('|', p_brand, p_type) AS brand_type,
             |lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
             |trim(p_name) AS name_trim
             |FROM part WHERE p_partkey % 7 = 0""".stripMargin)),

    // --- Date/time function family ---------------------------------------
    Q("q17_date_funcs",
      (spark, dir) => {
        val o = Tables.load(spark, dir, "orders")
        o.select(
            col("o_orderkey"),
            year(col("o_orderdate")).as("yr"),
            quarter(col("o_orderdate")).as("qtr"),
            month(col("o_orderdate")).as("mo"),
            dayofmonth(col("o_orderdate")).as("dom"),
            date_trunc("month", col("o_orderdate")).as("month_start"),
            datediff(col("o_orderdate"), lit("1995-01-01").cast("timestamp")).as("days_since_epoch"),
            last_day(col("o_orderdate")).cast("timestamp").as("month_end"),
            add_months(col("o_orderdate"), 3).cast("timestamp").as("plus_quarter"))
          .filter(col("o_orderkey") % 13 === 0)
      },
      Some("""SELECT o_orderkey, CAST(year(o_orderdate) AS INT) AS yr,
             |CAST(quarter(o_orderdate) AS INT) AS qtr, CAST(month(o_orderdate) AS INT) AS mo,
             |CAST(day(o_orderdate) AS INT) AS dom,
             |date_trunc('month', o_orderdate) AS month_start,
             |CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INT) AS days_since_epoch,
             |CAST(last_day(o_orderdate) AS TIMESTAMP) AS month_end,
             |o_orderdate + INTERVAL 3 MONTH AS plus_quarter
             |FROM orders WHERE o_orderkey % 13 = 0""".stripMargin)),

    // --- Math function family (exact-or-correctly-rounded ops only) ------
    Q("q18_math_funcs",
      (spark, dir) => {
        val li = Tables.load(spark, dir, "lineitem")
        li.select(
            col("l_orderkey"), col("l_linenumber"),
            abs(col("l_discount") - 0.05).as("disc_dev"),
            ceil(col("l_extendedprice")).as("price_ceil"),
            floor(col("l_extendedprice")).as("price_floor"),
            sqrt(col("l_quantity")).as("qty_sqrt"),
            (col("l_quantity") * col("l_quantity")).as("qty_sq"),
            pmod(col("l_orderkey"), lit(97)).as("key_mod"),
            greatest(col("l_tax"), col("l_discount")).as("max_rate"),
            least(col("l_tax"), col("l_discount")).as("min_rate"),
            signum(col("l_discount") - col("l_tax")).as("rate_sign"))
          .filter(col("l_orderkey") % 101 === 0)
      },
      Some("""SELECT l_orderkey, l_linenumber, abs(l_discount - 0.05) AS disc_dev,
             |CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
             |CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
             |sqrt(l_quantity) AS qty_sqrt, l_quantity * l_quantity AS qty_sq,
             |CAST(l_orderkey % 97 AS BIGINT) AS key_mod,
             |greatest(l_tax, l_discount) AS max_rate, least(l_tax, l_discount) AS min_rate,
             |CAST(sign(l_discount - l_tax) AS DOUBLE) AS rate_sign
             |FROM lineitem WHERE l_orderkey % 101 = 0""".stripMargin)),

    // --- Conditional expressions ------------------------------------------
    Q("q19_case_coalesce",
      (spark, dir) => {
        val c = Tables.load(spark, dir, "customer")
        c.select(
            col("c_custkey"),
            when(col("c_acctbal") < 0, "overdrawn")
              .when(col("c_acctbal") < 1000, "low")
              .when(col("c_acctbal") < 5000, "mid")
              .otherwise("high").as("bal_band"),
            coalesce(nullif(col("c_mktsegment"), lit("MACHINERY")), lit("none")).as("seg_or_none"))
          .groupBy(col("bal_band"), col("seg_or_none"))
          .agg(count(lit(1)).as("n"))
      },
      Some("""SELECT CASE WHEN c_acctbal < 0 THEN 'overdrawn'
             |  WHEN c_acctbal < 1000 THEN 'low' WHEN c_acctbal < 5000 THEN 'mid'
             |  ELSE 'high' END AS bal_band,
             |COALESCE(NULLIF(c_mktsegment, 'MACHINERY'), 'none') AS seg_or_none,
             |COUNT(*) AS n FROM customer GROUP BY 1, 2""".stripMargin)),

    // --- Exact percentiles / median --------------------------------------
    Q("q20_percentiles",
      (spark, dir) => {
        val o = Tables.load(spark, dir, "orders")
        o.groupBy(col("o_orderpriority"))
          .agg(
            round(expr("percentile(o_totalprice, 0.5)"), 4).as("median_price"),
            round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90_price"),
            min(col("o_totalprice")).as("min_price"),
            max(col("o_totalprice")).as("max_price"),
            count(lit(1)).as("n"))
      },
      Some("""SELECT o_orderpriority,
             |ROUND(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
             |ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90_price,
             |MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price, COUNT(*) AS n
             |FROM orders GROUP BY o_orderpriority""".stripMargin)),

    // --- JSON functions ---------------------------------------------------
    Q("q21_json_funcs",
      (spark, dir) => {
        val e = Tables.load(spark, dir, "events")
        e.select(col("event_type"),
            get_json_object(col("props"), "$.k").cast("bigint").as("k"))
          .groupBy(col("event_type"))
          .agg(sum(col("k")).as("k_sum"), max(col("k")).as("k_max"),
            count(lit(1)).as("n"))
      },
      Some("""SELECT event_type,
             |CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
             |CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_max,
             |COUNT(*) AS n
             |FROM events GROUP BY event_type""".stripMargin)),

    // --- Pivot (conditional aggregation) ----------------------------------
    Q("q22_pivot",
      (spark, dir) => {
        val e = Tables.load(spark, dir, "events")
        e.groupBy(col("user_id"))
          .pivot(col("event_type"), Seq("view", "click", "purchase", "signup", "error"))
          .agg(count(lit(1)))
          .na.fill(0L)
          .withColumnsRenamed(Map("view" -> "n_view", "click" -> "n_click",
            "purchase" -> "n_purchase", "signup" -> "n_signup", "error" -> "n_error"))
      },
      Some("""SELECT user_id,
             |COUNT(*) FILTER (WHERE event_type = 'view') AS n_view,
             |COUNT(*) FILTER (WHERE event_type = 'click') AS n_click,
             |COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
             |COUNT(*) FILTER (WHERE event_type = 'signup') AS n_signup,
             |COUNT(*) FILTER (WHERE event_type = 'error') AS n_error
             |FROM events GROUP BY user_id""".stripMargin)),

    // --- Time-window aggregation (tumbling) --------------------------------
    Q("q23_time_window",
      (spark, dir) => {
        val e = Tables.load(spark, dir, "events")
        e.groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(money(col("value"))).cast("double").as("value_sum"))
          .select(col("w.start").as("hour_start"), col("event_type"), col("n"), col("value_sum"))
      },
      Some("""SELECT date_trunc('hour', ts) AS hour_start, event_type, COUNT(*) AS n,
             |CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
             |FROM events GROUP BY 1, 2""".stripMargin)),

    // --- Sessionization (gaps-and-islands) ---------------------------------
    Q("q24_sessionization",
      (spark, dir) => {
        val e = Tables.load(spark, dir, "events")
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val gapped = e.select(col("user_id"), col("ts"), col("event_id"),
          when(unix_millis(col("ts")) - unix_millis(lag(col("ts"), 1).over(w)) > 30L * 60 * 1000, 1L)
            .otherwise(0L).as("is_new_session"))
        val sessions = gapped.select(col("user_id"), col("ts"), col("event_id"),
          sum(col("is_new_session")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("session_id"))
        sessions.groupBy(col("user_id"), col("session_id"))
          .agg(count(lit(1)).as("n_events"),
            (unix_millis(max(col("ts"))) - unix_millis(min(col("ts")))).as("duration_ms"))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_sessions"),
            max(col("n_events")).as("max_session_events"),
            sum(col("duration_ms")).as("total_duration_ms"))
      },
      Some("""WITH gapped AS (
             |  SELECT user_id, ts, event_id,
             |    CASE WHEN epoch_ms(ts) - epoch_ms(LAG(ts) OVER w) > 1800000
             |      THEN 1 ELSE 0 END AS is_new_session
             |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |sessions AS (
             |  SELECT user_id, ts,
             |    SUM(is_new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
             |  FROM gapped),
             |per_session AS (
             |  SELECT user_id, session_id, COUNT(*) AS n_events,
             |    epoch_ms(MAX(ts)) - epoch_ms(MIN(ts)) AS duration_ms
             |  FROM sessions GROUP BY user_id, session_id)
             |SELECT user_id, COUNT(*) AS n_sessions,
             |  CAST(MAX(n_events) AS BIGINT) AS max_session_events,
             |  CAST(SUM(duration_ms) AS BIGINT) AS total_duration_ms
             |FROM per_session GROUP BY user_id""".stripMargin)),

    // Spark's built-in approx sketches (approx_count_distinct HLL,
    // percentile_approx GK) are deliberately NOT registered: their
    // internals are engine-specific, so no DuckDB oracle can exist by
    // category and a registry entry would sit permanently amber
    // (rows-only) in every CORRECTNESS artifact. The shapes live under
    // accuracy-bound specs in SketchSpec (including the former
    // q25_sketches grouped single-pass query), and every sketch FAMILY
    // has a deterministic, hash-gated counterpart: distinct → q106/q120,
    // quantiles → q107, frequencies → q123.
  )
}
