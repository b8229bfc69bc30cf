package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Third relational batch: recognizable TPC-H shapes adapted to the
  * available columns, window frame/distribution functions, and
  * higher-order array functions — all DuckDB-oracled. */
object RelationalQueries3 {
  import Registry.Q

  private def money(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 2))

  val all: Seq[Q] = Seq(
    // TPC-H Q5 shape: revenue by nation for one region, all joins local
    // to the region → nation/region broadcast, one shuffle for the agg.
    Q("q60_local_supplier_volume",
      (spark, dir) => {
        val li = Tables.load(spark, dir, "lineitem")
        val o = Tables.load(spark, dir, "orders")
        val c = Tables.load(spark, dir, "customer")
        val s = Tables.load(spark, dir, "supplier")
        val n = Tables.load(spark, dir, "nation")
        val r = Tables.load(spark, dir, "region")
        li.join(o, li("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .join(s, li("l_suppkey") === s("s_suppkey") &&
            c("c_nationkey") === s("s_nationkey"))
          .join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .filter(col("r_name") === "ASIA" &&
            col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
          .groupBy(col("n_name"))
          .agg(sum(money(col("l_extendedprice")) * (lit(1) - money(col("l_discount"))))
            .cast("double").as("revenue"),
            count(lit(1)).as("n_items"))
      },
      Some("""SELECT n_name,
             |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
             |COUNT(*) AS n_items
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01'
             |AND o_orderdate < TIMESTAMP '1998-01-01'
             |GROUP BY n_name""".stripMargin)),

    // TPC-H Q18 shape: large orders via HAVING on a grouped subquery,
    // then join back to orders/customer.
    Q("q61_large_orders",
      (spark, dir) => {
        val li = Tables.load(spark, dir, "lineitem")
        val o = Tables.load(spark, dir, "orders")
        val c = Tables.load(spark, dir, "customer")
        val big = li.groupBy(col("l_orderkey"))
          .agg(sum(col("l_quantity").cast("bigint")).as("total_qty"))
          .filter(col("total_qty") > 150)
        big.join(o, big("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .select(col("c_name"), col("o_orderkey"), col("o_totalprice"),
            col("total_qty"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(50)
      },
      Some("""SELECT c_name, o_orderkey, o_totalprice, CAST(total_qty AS BIGINT) AS total_qty
             |FROM (SELECT l_orderkey, SUM(CAST(l_quantity AS BIGINT)) AS total_qty
             |      FROM lineitem GROUP BY l_orderkey HAVING SUM(CAST(l_quantity AS BIGINT)) > 150) big
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 50""".stripMargin)),

    // TPC-H Q14 shape: conditional revenue share (promo vs total).
    Q("q62_promo_share",
      (spark, dir) => {
        val li = Tables.load(spark, dir, "lineitem")
        val p = Tables.load(spark, dir, "part")
        val joined = li.join(p, li("l_partkey") === p("p_partkey"))
          .withColumn("rev", money(col("l_extendedprice")) *
            (lit(1) - money(col("l_discount"))))
        joined.groupBy(year(col("l_shipdate")).as("ship_year"))
          .agg(
            sum(when(col("p_type") === "PROMO", col("rev"))
              .otherwise(lit(0).cast(DecimalType(18, 4)))).cast("double")
              .as("promo_rev"),
            sum(col("rev")).cast("double").as("total_rev"),
            count(lit(1)).as("n"))
      },
      Some("""SELECT CAST(year(l_shipdate) AS INT) AS ship_year,
             |CAST(SUM(CASE WHEN p_type = 'PROMO'
             |  THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
             |  ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS promo_rev,
             |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_rev,
             |COUNT(*) AS n
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |GROUP BY year(l_shipdate)""".stripMargin)),

    // Window frames + distribution functions: range frame, ntile,
    // percent_rank, cume_dist, first/last value over explicit frames.
    Q("q63_window_frames",
      (spark, dir) => {
        val c = Tables.load(spark, dir, "customer")
        val byBal = Window.partitionBy(col("c_mktsegment"))
          .orderBy(col("c_acctbal"), col("c_custkey"))
        c.filter(col("c_custkey") % 11 === 0)
          .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
            ntile(4).over(byBal).as("quartile"),
            round(percent_rank().over(byBal), 6).as("pct_rank"),
            round(cume_dist().over(byBal), 6).as("cdist"),
            first(col("c_custkey")).over(byBal
              .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
              .as("poorest"),
            last(col("c_custkey")).over(byBal
              .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
              .as("richest"))
      },
      Some("""SELECT c_mktsegment, c_custkey, c_acctbal,
             |CAST(ntile(4) OVER w AS INT) AS quartile,
             |ROUND(percent_rank() OVER w, 6) AS pct_rank,
             |ROUND(cume_dist() OVER w, 6) AS cdist,
             |CAST(first_value(c_custkey) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey
             |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS BIGINT) AS poorest,
             |CAST(last_value(c_custkey) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey
             |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS BIGINT) AS richest
             |FROM customer WHERE c_custkey % 11 = 0
             |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)""".stripMargin)),

    // Higher-order array functions: transform / filter / reduce.
    Q("q64_higher_order_fns",
      (spark, dir) => {
        val e = Tables.load(spark, dir, "embeddings")
        e.filter(col("vec_id") < 100)
          .select(col("vec_id"),
            round(aggregate(transform(col("embedding"), x => x.cast("double") * 2),
              lit(0.0), (acc, x) => acc + x), 6).as("sum_doubled"),
            size(filter(col("embedding"), x => x > 0)).as("n_positive"),
            round(element_at(transform(col("embedding"),
              x => x.cast("double") * x.cast("double")), 1), 6).as("first_sq"))
      },
      Some("""SELECT vec_id,
             |ROUND(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * 2),
             |  (a, b) -> a + b), 6) AS sum_doubled,
             |CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_positive,
             |ROUND(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))[1], 6) AS first_sq
             |FROM embeddings WHERE vec_id < 100""".stripMargin)),

    // Pure non-equi theta join (BroadcastNestedLoopJoin): nation pairs
    // related only by < and != predicates — no equi key at all.
    Q("q66_theta_join",
      (spark, dir) => {
        val n = Tables.load(spark, dir, "nation")
        val a = n.select(col("n_nationkey").as("a_key"),
          col("n_name").as("a_name"), col("n_regionkey").as("a_region"))
        val b = n.select(col("n_nationkey").as("b_key"),
          col("n_regionkey").as("b_region"))
        a.join(b, col("a_key") < col("b_key") &&
            col("a_region") =!= col("b_region"))
          .groupBy(col("a_name"))
          .agg(count(lit(1)).as("n_foreign_later"),
            sum(col("b_key").cast("bigint")).as("key_sum"))
      },
      Some("""SELECT a.n_name AS a_name, COUNT(*) AS n_foreign_later,
             |CAST(SUM(b.n_nationkey) AS BIGINT) AS key_sum
             |FROM nation a JOIN nation b
             |ON a.n_nationkey < b.n_nationkey AND a.n_regionkey <> b.n_regionkey
             |GROUP BY a.n_name""".stripMargin)),

    // Map construction + extraction (map_from_arrays / element_at /
    // map_keys). DuckDB's map extraction returns a LIST → [1] unwraps.
    Q("q67_map_funcs",
      (spark, dir) => {
        val e = Tables.load(spark, dir, "events")
        val m = map_from_arrays(
          array(lit("et"), lit("uid")),
          array(col("event_type"), col("user_id").cast("string")))
        e.select(m.as("m"))
          .select(element_at(col("m"), "et").as("et"),
            element_at(col("m"), "uid").as("uid"),
            size(map_keys(col("m"))).as("n_keys"))
          .groupBy(col("et"))
          .agg(countDistinct(col("uid")).as("n_users"),
            max(col("n_keys")).as("n_keys"),
            count(lit(1)).as("n"))
      },
      Some("""WITH m AS (SELECT map(['et','uid'],
             |    [event_type, CAST(user_id AS VARCHAR)]) AS m FROM events)
             |SELECT m['et'][1] AS et,
             |  COUNT(DISTINCT m['uid'][1]) AS n_users,
             |  CAST(MAX(cardinality(m)) AS INT) AS n_keys,
             |  COUNT(*) AS n
             |FROM m GROUP BY 1""".stripMargin)),

    // Anti-join dedup keep-first (the dropDuplicates shape, oracled).
    Q("q65_keep_first",
      (spark, dir) => {
        val d = Tables.load(spark, dir, "documents")
        val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
        d.select(col("doc_id"), col("lang"), row_number().over(w).as("rn"))
          .filter(col("rn") === 1)
          .select(col("lang"), col("doc_id").as("first_doc"))
      },
      Some("""SELECT lang, CAST(MIN(doc_id) AS BIGINT) AS first_doc
             |FROM documents GROUP BY lang""".stripMargin)),
  )
}
