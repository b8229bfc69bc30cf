package graft

import org.apache.spark.sql.functions._

import graft.plans.TopKAggregator

/** Second relational batch: subqueries, ordered collects, arg-min/max,
  * conditional aggregation, predicate families, array explode, and the
  * custom bounded top-k aggregator (checked against the window form's
  * oracle — same semantics, map-side-combining plan). */
object RelationalQueries2 {
  import Registry.Q

  val all: Seq[Q] = Seq(
    // Correlated scalar aggregate via join (the Spark-native decorrelated
    // form): customers above their nation's average balance.
    Q("q26_scalar_subquery",
      (spark, dir) => {
        val c = Tables.load(spark, dir, "customer")
        val natAvg = c.groupBy(col("c_nationkey"))
          .agg(avg(col("c_acctbal")).as("nat_avg"))
        c.join(broadcast(natAvg), Seq("c_nationkey"))
          .filter(col("c_acctbal") > col("nat_avg"))
          .groupBy(col("c_nationkey"))
          .agg(count(lit(1)).as("n_above"),
            round(max(col("c_acctbal")), 2).as("top_bal"))
      },
      Some("""SELECT c_nationkey, COUNT(*) AS n_above,
             |ROUND(MAX(c_acctbal), 2) AS top_bal
             |FROM customer c
             |WHERE c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2
             |                   WHERE c2.c_nationkey = c.c_nationkey)
             |GROUP BY c_nationkey""".stripMargin)),

    // Ordered collect: deterministic via sort_array, joined to a string.
    Q("q27_collect_sorted",
      (spark, dir) => {
        val s = Tables.load(spark, dir, "supplier")
        s.groupBy(col("s_nationkey"))
          .agg(array_join(sort_array(collect_list(col("s_name"))), ",")
            .as("suppliers"),
            count(lit(1)).as("n"))
      },
      Some("""SELECT s_nationkey,
             |array_to_string(list_sort(list(s_name)), ',') AS suppliers,
             |COUNT(*) AS n
             |FROM supplier GROUP BY s_nationkey""".stripMargin)),

    // arg-max/arg-min (min_by/max_by) — unique extrema in this data;
    // deterministic because o_totalprice collisions don't occur per group.
    Q("q28_min_by_max_by",
      (spark, dir) => {
        val o = Tables.load(spark, dir, "orders")
        // deterministic arg-max under price ties: single sortable BIGINT key
        // (cents × 1e8 + orderkey) — DuckDB's arg_max can't take a struct key
        val key = (round(col("o_totalprice") * 100).cast("bigint") * 100000000L +
          col("o_orderkey")).as("ordKey")
        o.withColumn("ordKey", key)
          .groupBy(col("o_orderpriority"))
          .agg(max_by(col("o_orderkey"), col("ordKey")).as("biggest_order"),
            min_by(col("o_orderkey"), col("ordKey")).as("smallest_order"),
            round(max(col("o_totalprice")), 2).as("max_price"))
      },
      Some("""SELECT o_orderpriority,
             |CAST(arg_max(o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) * 100000000 + o_orderkey) AS BIGINT) AS biggest_order,
             |CAST(arg_min(o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) * 100000000 + o_orderkey) AS BIGINT) AS smallest_order,
             |ROUND(MAX(o_totalprice), 2) AS max_price
             |FROM orders GROUP BY o_orderpriority""".stripMargin)),

    // Conditional aggregation: count_if / sum-where / any/every.
    Q("q29_conditional_agg",
      (spark, dir) => {
        val li = Tables.load(spark, dir, "lineitem")
        li.groupBy(col("l_returnflag"))
          .agg(count_if(col("l_discount") > 0.05).as("n_discounted"),
            sum(when(col("l_tax") > 0, col("l_quantity")).otherwise(0)
              .cast("bigint")).as("taxed_qty"),
            bool_and(col("l_quantity") > 0).as("all_positive"),
            bool_or(col("l_discount") === 0).as("any_zero_discount"))
      },
      Some("""SELECT l_returnflag,
             |CAST(count_if(l_discount > 0.05) AS BIGINT) AS n_discounted,
             |CAST(SUM(CASE WHEN l_tax > 0 THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS taxed_qty,
             |bool_and(l_quantity > 0) AS all_positive,
             |bool_or(l_discount = 0) AS any_zero_discount
             |FROM lineitem GROUP BY l_returnflag""".stripMargin)),

    // Predicate family: IN-list, BETWEEN, LIKE, IS NULL handling.
    Q("q55_predicates",
      (spark, dir) => {
        val p = Tables.load(spark, dir, "part")
        p.filter(col("p_type").isin("ECONOMY", "STANDARD", "PROMO") &&
            col("p_size").between(10, 40) &&
            col("p_name").like("%a%"))
          .groupBy(col("p_type"))
          .agg(count(lit(1)).as("n"), sum(col("p_size").cast("bigint")).as("size_sum"))
      },
      Some("""SELECT p_type, COUNT(*) AS n,
             |CAST(SUM(CAST(p_size AS BIGINT)) AS BIGINT) AS size_sum
             |FROM part
             |WHERE p_type IN ('ECONOMY','STANDARD','PROMO')
             |AND p_size BETWEEN 10 AND 40 AND p_name LIKE '%a%'
             |GROUP BY p_type""".stripMargin)),

    // Array explode with position (generator/lateral-view surface).
    Q("q56_posexplode",
      (spark, dir) => {
        val e = Tables.load(spark, dir, "embeddings")
        e.filter(col("vec_id") < 50)
          .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "x")))
          .groupBy((col("pos") % 8).as("pos_bucket"))
          .agg(count(lit(1)).as("n"),
            round(sum(col("x").cast("double")), 4).as("x_sum"))
      },
      Some("""SELECT CAST((u.pos - 1) % 8 AS INT) AS pos_bucket, COUNT(*) AS n,
             |ROUND(SUM(CAST(u.x AS DOUBLE)), 4) AS x_sum
             |FROM (SELECT vec_id, unnest(embedding) AS x,
             |        generate_subscripts(embedding, 1) AS pos
             |      FROM embeddings WHERE vec_id < 50) u
             |GROUP BY 1""".stripMargin)),

    // Custom bounded top-k aggregator vs the window form's oracle: same
    // rows as q11-style row_number()<=3, but map-side combining (shuffles
    // ≤k rows per group per task instead of sorting whole partitions).
    Q("q57_topk_aggregator",
      (spark, dir) => {
        val c = Tables.load(spark, dir, "customer")
        c.groupBy(col("c_nationkey"))
          .agg(TopKAggregator.top_k(3)(col("c_acctbal"), col("c_custkey")).as("top"))
          .select(col("c_nationkey"), posexplode(col("top")).as(Seq("rk", "t")))
          .select(col("c_nationkey"), col("t.id").as("c_custkey"),
            col("t.score").as("c_acctbal"), (col("rk") + 1).as("rn"))
      },
      Some("""SELECT c_nationkey, c_custkey, c_acctbal, CAST(rn AS INT) AS rn FROM (
             |  SELECT c_nationkey, c_custkey, c_acctbal,
             |    ROW_NUMBER() OVER (PARTITION BY c_nationkey
             |      ORDER BY c_acctbal DESC, c_custkey) AS rn
             |  FROM customer) t WHERE rn <= 3""".stripMargin)),
  )
}
