package graft

import org.apache.spark.sql.functions._

import graft.operators.Layout

/** Data-layout queries — the write→prune loop of [[Layout]] under the
  * driver's oracle gate. q124 (RelationalQueries5) gates the morton
  * CODE arithmetic; the queries here gate what the codes are FOR:
  * reading a 2-D rectangle out of a z-clustered table and getting the
  * same answer as the unclustered oracle (the pruning itself — that the
  * clustered scan reads fewer rows — is asserted in LayoutSpec, where
  * scan metrics are visible).
  */
object LayoutQueries {
  import Registry.Q

  /** lineitem's integral key columns re-written Z-ORDER-clustered on
    * (l_partkey, l_suppkey) — generate-once per sf dir + content
    * fingerprint, marker-guarded (the [[PipelineQueries]] fixture
    * discipline). 16 splits: enough distinct code ranges that row-group
    * stats discriminate, small enough that the write stays cheap at the
    * bench SF. */
  private def zorderedLineitemDir(spark: org.apache.spark.sql.SparkSession,
      dir: String): String = {
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_linenumber"))
    val d = s"/tmp/graft-zorder-${dir.replaceAll("[^a-zA-Z0-9]", "_")}" +
      s"-${Tables.fingerprint(li, "l_orderkey")}"
    if (!new java.io.File(s"$d/_SUCCESS").exists()) {
      Layout.clusterBy(li,
          Layout.morton2(col("l_partkey"), col("l_suppkey"), bits = 16), 16)
        .write.mode("overwrite").parquet(d)
    }
    d
  }

  val all: Seq[Q] = Seq(
    // Z-order write→prune END-TO-END: lineitem is physically re-written
    // clustered by morton2(l_partkey, l_suppkey), then a 2-D rectangle
    // is read back OUT OF THE CLUSTERED FILES and aggregated. The
    // oracle runs the same rectangle on the original (unclustered)
    // table — a re-layout must never change an answer, only its cost.
    // The cost half (the clustered scan materializes a fraction of the
    // rows the unclustered layout does, via pushed-down row-group
    // stats) is asserted in LayoutSpec's pruning test.
    Q("q130_zorder_prune",
      (spark, dir) => {
        val z = spark.read.parquet(zorderedLineitemDir(spark, dir))
        z.filter(col("l_partkey").between(1, 50) &&
            col("l_suppkey").between(1, 5))
          .groupBy(col("l_suppkey"))
          .agg(count(lit(1)).as("n"),
            sum(col("l_partkey")).as("part_sum"),
            sum(col("l_orderkey")).as("order_sum"),
            max(col("l_linenumber")).as("max_line"))
      },
      Some("""SELECT l_suppkey, count(*) AS n,
             |  CAST(sum(l_partkey) AS BIGINT) AS part_sum,
             |  CAST(sum(l_orderkey) AS BIGINT) AS order_sum,
             |  max(l_linenumber) AS max_line
             |FROM lineitem
             |WHERE l_partkey BETWEEN 1 AND 50 AND l_suppkey BETWEEN 1 AND 5
             |GROUP BY 1""".stripMargin)),
  )
}
