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

  /** The generate-once discipline all derived layout fixtures share:
    * a /tmp dir keyed on the sf dir + the source's CONTENT fingerprint
    * + a `tag` that MUST encode every build parameter (bits, splits,
    * target size...) — a parameter change with an unchanged tag would
    * silently reuse the stale layout, invisible to the hash gate
    * because answers are layout-independent. Marker-guarded. */
  private def derivedDir(dir: String, tag: String, fp: String)(
      build: String => Unit): String = {
    val d = s"/tmp/graft-$tag-${dir.replaceAll("[^a-zA-Z0-9]", "_")}-$fp"
    if (!new java.io.File(s"$d/_SUCCESS").exists()) build(d)
    d
  }

  /** documents re-written hive-partitioned by `lang` (fingerprint-keyed
    * create-once fixture) — the directory-level layout q159/q160 read. */
  private def partitionedDocsDir(spark: org.apache.spark.sql.SparkSession,
      dir: String): String = {
    val d0 = Tables.load(spark, dir, "documents")
    val fp = Tables.fingerprint(d0, "doc_id", s"$dir/documents_part")
    derivedDir(dir, "docpart", fp) { d =>
      d0.write.partitionBy("lang").mode("overwrite").parquet(d)
    }
  }

  /** The q160 language→region dimension — written once as PARQUET and
    * read back, because dynamic partition pruning requires a real
    * selective Filter on the dim side: over a LocalRelation, Catalyst
    * constant-folds the predicate into the literal rows and the
    * PartitionPruning rule sees no filter to derive the runtime
    * subquery from (observed: DPP silently absent). */
  private def langDim(spark: org.apache.spark.sql.SparkSession) = {
    import spark.implicits._
    val d = derivedDir("static", "langdim", "v1") { p =>
      Seq(("de", "europe"), ("fr", "europe"), ("es", "europe"),
        ("en", "anglo"), ("zh", "asia")).toDF("lang", "region0")
        .coalesce(1).write.mode("overwrite").parquet(p)
    }
    spark.read.parquet(d)
  }

  /** The q165 fixture pair: documents written hive-partitioned AND
    * deliberately fragmented (repartition(8) before partitionBy → up to
    * 8 files per lang dir — the streaming-ingest-into-partitions
    * pathology), then compacted per-partition through
    * [[graft.operators.Compaction.compactPartitioned]] — the q159+q137
    * composition that IS the table-maintenance loop. The build REQUIREs
    * every per-partition plan narrow (shuffles=false), so a shuffle
    * regression fails the gate loudly at fixture build, not silently. */
  private def compactedPartitionedDocsDir(
      spark: org.apache.spark.sql.SparkSession, dir: String): String = {
    val d0 = Tables.load(spark, dir, "documents")
    val fp = Tables.fingerprint(d0, "doc_id", s"$dir/documents_part")
    val frag = derivedDir(dir, "docpart-frag8", fp) { d =>
      d0.repartition(8).write.partitionBy("lang").mode("overwrite").parquet(d)
    }
    derivedDir(dir, "docpart-compact1m", fp) { d =>
      graft.operators.Compaction.compactPartitioned(spark, frag, d, 1L << 20)
        .foreach { case (part, pl) =>
          require(!pl.shuffles, s"partition $part compaction shuffled")
        }
      // compactPartitioned writes per-partition _SUCCESS markers; the
      // create-once guard needs the top-level one
      new java.io.File(d, "_SUCCESS").createNewFile()
    }
  }

  private def lineitemKeys(spark: org.apache.spark.sql.SparkSession,
      dir: String) =
    Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_linenumber"))

  private def lineitemFp(spark: org.apache.spark.sql.SparkSession,
      dir: String): String =
    Tables.fingerprint(lineitemKeys(spark, dir), "l_orderkey", s"$dir/lineitem")

  /** lineitem re-written Z-ORDER-clustered on (l_partkey, l_suppkey).
    * 16 splits: enough distinct code ranges that row-group stats
    * discriminate, small enough that the write stays cheap at the
    * bench SF. */
  private def zorderedLineitemDir(spark: org.apache.spark.sql.SparkSession,
      dir: String): String =
    derivedDir(dir, "zorder-b16s16", lineitemFp(spark, dir)) { d =>
      Layout.clusterBy(lineitemKeys(spark, dir),
          Layout.morton2(col("l_partkey"), col("l_suppkey"), bits = 16), 16)
        .write.mode("overwrite").parquet(d)
    }

  /** lineitem re-written HILBERT-clustered — q130's sibling on the
    * continuous curve. bits = 15: the code domain must COVER the widest
    * clustered dimension (sf0.1 partkey reaches 19,999 — 15 bits), or
    * the mask aliases distant partkey bands into one cell and the
    * layout silently stops pruning on that column at exactly the SF
    * that matters (review finding: 11 bits covered only sf0.01). */
  private def hilbertLineitemDir(spark: org.apache.spark.sql.SparkSession,
      dir: String): String =
    derivedDir(dir, "hilbert-b15s16", lineitemFp(spark, dir)) { d =>
      Layout.clusterBy(
          Layout.withHilbert2(lineitemKeys(spark, dir),
            col("l_partkey"), col("l_suppkey"), 15, "_h"),
          col("_h"), 16)
        .drop("_h")
        .write.mode("overwrite").parquet(d)
    }

  /** A deliberately-fragmented lineitem copy (64 small files — the
    * streaming-ingest pathology) compacted back through
    * [[graft.operators.Compaction]]. */
  private def compactedLineitemDir(spark: org.apache.spark.sql.SparkSession,
      dir: String): String = {
    val fp = lineitemFp(spark, dir)
    val frag = derivedDir(dir, "frag-f64", fp) { d =>
      Tables.load(spark, dir, "lineitem")
        .repartition(64).write.mode("overwrite").parquet(d)
    }
    derivedDir(dir, "compact-t512m", fp) { d =>
      graft.operators.Compaction.compact(spark, frag, d,
        targetBytes = 512L * 1024 * 1024)
    }
  }

  /** orders and customer saved as BUCKETED tables (8 buckets on the
    * join key, one sorted bucket spec each) — the co-located-join
    * layout: both sides' files are pre-partitioned by the key, so the
    * join needs NO exchange on either side (PlanSpec asserts it). The
    * session catalog is in-memory, so the tables are (re)created once
    * per session per content fingerprint; the warehouse dir is
    * gitignored scratch. */
  private def bucketedTables(spark: org.apache.spark.sql.SparkSession,
      dir: String): (String, String) = {
    val o = Tables.load(spark, dir, "orders")
    val c = Tables.load(spark, dir, "customer")
    // each table keyed on its OWN content fingerprint (judge finding:
    // keying customer on orders' fingerprint would silently serve a stale
    // bucketed customer table if customer alone were regenerated)
    val fpO = Tables.fingerprint(o, "o_orderkey", s"$dir/orders_bucketed")
    val fpC = Tables.fingerprint(c, "c_custkey", s"$dir/customer_bucketed")
    val to = s"graft_bucketed_orders_$fpO"
    val tc = s"graft_bucketed_customer_$fpC"
    graft.operators.Layout.bucketize(spark, o, to, 8, "o_custkey")
    graft.operators.Layout.bucketize(spark, c, tc, 8, "c_custkey")
    (to, tc)
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

    // N-dimensional morton codes (Layout.mortonN) — the 3-column ZORDER
    // BY key, gated on its bit arithmetic like q124: codes over
    // (l_partkey, l_suppkey, l_linenumber) at 10 bits/dim, rolled up
    // per high-bits bucket. The oracle unrolls the identical 30
    // shift/mask/OR terms in SQL.
    Q("q131_mortonN_codes",
      (spark, dir) => {
        val l = Tables.load(spark, dir, "lineitem")
        val code = Layout.mortonN(
          Seq(col("l_partkey"), col("l_suppkey"), col("l_linenumber")),
          bits = 10)
        l.select(code.as("z"), col("l_orderkey"))
          .groupBy(expr("z DIV 1048576").as("bucket"))
          .agg(count(lit(1)).as("n"),
            min(col("z")).as("min_code"), max(col("z")).as("max_code"),
            sum(col("l_orderkey")).as("order_sum"))
      },
      Some(q131Oracle(10))),

    // Hilbert-curve codes (Layout.withHilbert2) — the continuous
    // space-filling key (better locality than z-order: LayoutSpec
    // proves every consecutive code pair is an adjacent cell). Gated on
    // the full per-level transform: the oracle replays the identical
    // reflect/swap/accumulate chain as one SQL CTE per bit level.
    Q("q132_hilbert_codes",
      (spark, dir) => {
        val l = Tables.load(spark, dir, "lineitem")
        Layout.withHilbert2(l.select(col("l_orderkey"), col("l_partkey"),
              col("l_suppkey")),
            col("l_partkey"), col("l_suppkey"), bits = 8, out = "h")
          .groupBy(expr("h DIV 1024").as("bucket"))
          .agg(count(lit(1)).as("n"),
            min(col("h")).as("min_code"), max(col("h")).as("max_code"),
            sum(col("l_orderkey")).as("order_sum"))
      },
      Some(q132Oracle(8))),

    // Small-files compaction END-TO-END: lineitem fragmented into 64
    // small files (the streaming-ingest pathology), rewritten to
    // target-sized files through Compaction (a narrow coalesce — no
    // shuffle, spec-asserted), then aggregated OUT OF THE COMPACTED
    // FILES under the hash gate. Oracle = the same aggregate on the
    // original table: compaction must never change a row, only the
    // file granularity (the granularity half is CompactionSpec's).
    Q("q137_compaction",
      (spark, dir) => {
        spark.read.parquet(compactedLineitemDir(spark, dir))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n"),
            sum(col("l_orderkey")).as("order_sum"),
            sum(col("l_partkey")).as("part_sum"),
            max(col("l_linenumber")).as("max_line"))
      },
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS n,
             |  CAST(sum(l_orderkey) AS BIGINT) AS order_sum,
             |  CAST(sum(l_partkey) AS BIGINT) AS part_sum,
             |  max(l_linenumber) AS max_line
             |FROM lineitem GROUP BY 1, 2""".stripMargin)),

    // Hilbert write→prune end-to-end — q130 on the CONTINUOUS curve:
    // lineitem re-written clustered by the hilbert code, the same 2-D
    // rectangle read back out of the clustered files. Same oracle text
    // as q130 by design (a re-layout never changes an answer; only the
    // physical path differs), and LayoutSpec proves the hilbert layout
    // also reads < half the rows for this rectangle.
    Q("q138_hilbert_prune",
      (spark, dir) => {
        val h = spark.read.parquet(hilbertLineitemDir(spark, dir))
        h.filter(col("l_partkey").between(1, 50) &&
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

    // BUCKETED co-located join — the shuffle-avoidance layout for
    // repeated big joins (SCALE.md's "bucket the edge table" note made
    // runnable): both sides pre-bucketed by the join key into the same
    // bucket count, the sort-merge join (hinted, so a broadcast can't
    // mask the demo at small SFs) reads matching buckets directly and
    // the ONLY exchange in the whole plan is the final aggregation's
    // (PlanSpec asserts exactly that). The oracle is the plain join —
    // bucketing is a physical layout; the answer must be identical.
    Q("q140_bucketed_join",
      (spark, dir) => {
        val (to, tc) = bucketedTables(spark, dir)
        spark.table(to).hint("merge")
          .join(spark.table(tc), col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_orders"),
            max(col("o_custkey")).as("max_cust"),
            sum(col("o_orderkey")).as("order_sum"))
      },
      Some("""SELECT c_mktsegment, count(*) AS n_orders,
             |  max(o_custkey) AS max_cust,
             |  CAST(sum(o_orderkey) AS BIGINT) AS order_sum
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY 1""".stripMargin)),

    // Hive-style directory partitioning, the most basic 100 TB layout
    // tool: documents re-written partitionBy(lang), a single-language
    // read back out of the partitioned files. Static partition pruning
    // — the lang predicate becomes a PartitionFilter and only that
    // directory's files are LISTED, let alone read (PlanSpec asserts
    // the filter class; LayoutSpec-style file accounting is implicit:
    // the scan's location is the pruned partition). Re-layout rule:
    // same oracle as the plain filtered table.
    Q("q159_partition_prune",
      (spark, dir) => {
        val pd = spark.read.parquet(partitionedDocsDir(spark, dir))
        pd.filter(col("lang") === "de")
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("chars"))
      },
      Some("""SELECT source, count(*) AS n_docs,
             |  CAST(sum(n_chars) AS BIGINT) AS chars
             |FROM documents WHERE lang = 'de' GROUP BY 1""".stripMargin)),

    // DYNAMIC partition pruning: the partition predicate is not in the
    // query — it emerges from a dimension join (region0 = 'europe' on a
    // lang→region dim), and Spark injects the dim's surviving keys as a
    // runtime partition filter on the fact scan (PlanSpec asserts
    // dynamicpruning in the plan). THE star-schema fact-scan saver at
    // 100 TB. Oracle replays the join semantics over the plain table.
    Q("q160_dynamic_partition_prune",
      (spark, dir) => {
        val pd = spark.read.parquet(partitionedDocsDir(spark, dir))
        pd.join(broadcast(langDim(spark).filter(col("region0") === "europe")),
            Seq("lang"))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("doc_id")).as("id_sum"))
      },
      Some("""WITH dim(lang, region0) AS (VALUES
             |  ('de', 'europe'), ('fr', 'europe'), ('es', 'europe'),
             |  ('en', 'anglo'), ('zh', 'asia'))
             |SELECT d.lang, count(*) AS n_docs,
             |  CAST(sum(d.doc_id) AS BIGINT) AS id_sum
             |FROM documents d JOIN dim m ON m.lang = d.lang
             |WHERE m.region0 = 'europe' GROUP BY 1""".stripMargin)),

    // Partition maintenance END-TO-END (q159 ∘ q137): the fragmented
    // hive-partitioned table compacted per-partition — layout preserved
    // (lang still rides as a partition column, still prunable), every
    // per-partition plan narrow (REQUIREd at fixture build; file
    // accounting + zero-Exchange in CompactionSpec), and the rows
    // untouched: same oracle as the plain table (re-layout rule). The
    // read exercises the compacted layout's pruning too — one lang's
    // aggregate comes out of one compacted directory.
    // RENDEZVOUS SHARDING (Layout.rendezvousShards) — HRW assignment at
    // S=8 vs S=9: the stable doc→shard rule for incremental pipelines
    // (shard-local epoch indexes like q174/q209 survive a shard-count
    // change). The HRW guarantee IS the gate's dial: every moved doc
    // must land on the NEW shard 8 (old shards never trade docs), and
    // only ~1/9 of the corpus moves. The oracle replays mix64(id·31+s)
    // via one shared stage chain over the exploded (id, s) frame,
    // signed comparison, (h DESC, s DESC) tie-break.
    Q("q225_rendezvous_sharding",
      (spark, dir) =>
        Layout.rendezvousShards(
          Tables.load(spark, dir, "documents"), "doc_id", 8, 9),
      Some(s"""WITH ids AS (SELECT doc_id AS id FROM documents),
             |sh AS (SELECT id, unnest(generate_series(0, 8)) AS s FROM ids),
             |inp AS (SELECT id, s, CAST(id * 31 + s AS UBIGINT) AS x FROM sh),
             |${RelationalQueries5.mix64Stages("inp", Seq("id", "s"), "x",
                  signedOut = true)},
             |rk9 AS (SELECT id, s, row_number() OVER (PARTITION BY id
             |    ORDER BY h DESC, s DESC) AS rn FROM mixed),
             |rk8 AS (SELECT id, s, row_number() OVER (PARTITION BY id
             |    ORDER BY h DESC, s DESC) AS rn FROM mixed WHERE s < 8)
             |SELECT a8.id AS doc_id, CAST(a8.s AS BIGINT) AS shard_old,
             |  CAST(a9.s AS BIGINT) AS shard_new,
             |  CAST(CASE WHEN a8.s <> a9.s THEN 1 ELSE 0 END AS BIGINT) AS moved
             |FROM (SELECT id, s FROM rk8 WHERE rn = 1) a8
             |  JOIN (SELECT id, s FROM rk9 WHERE rn = 1) a9 ON a9.id = a8.id""".stripMargin)),

    Q("q165_partitioned_compaction",
      (spark, dir) => {
        val pd = spark.read.parquet(compactedPartitionedDocsDir(spark, dir))
        pd.groupBy(col("lang"), col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("chars"),
            sum(col("doc_id")).as("id_sum"))
      },
      Some("""SELECT lang, source, count(*) AS n_docs,
             |  CAST(sum(n_chars) AS BIGINT) AS chars,
             |  CAST(sum(doc_id) AS BIGINT) AS id_sum
             |FROM documents GROUP BY 1, 2""".stripMargin)),
  )

  /** The q131 oracle: mortonN's interleave unrolled — bits·3 terms, bit
    * i of column j at position 3i+j, then the same per-bucket rollup
    * (the q124 oracle generalized). */
  private def q131Oracle(bits: Int): String = {
    val cols = Seq("l_partkey", "l_suppkey", "l_linenumber")
    val terms = (for {
      i <- 0 until bits
      (c, j) <- cols.zipWithIndex
    } yield s"((($c >> $i) & 1) << ${i * 3 + j})").mkString(" | ")
    s"""WITH z AS (SELECT ($terms) AS z, l_orderkey FROM lineitem)
       |SELECT z // 1048576 AS bucket, count(*) AS n,
       |  CAST(min(z) AS BIGINT) AS min_code, CAST(max(z) AS BIGINT) AS max_code,
       |  CAST(sum(l_orderkey) AS BIGINT) AS order_sum
       |FROM z GROUP BY 1""".stripMargin
  }

  /** The q132 oracle: the xy2d Hilbert transform as one CTE per bit
    * level, high to low — each level adds s²·((3·rx) xor ry) to the
    * code and reflects/swaps (x, y) into the quadrant, exactly the
    * [[Layout.withHilbert2]] per-level projection. n−1 reflections and
    * the final rollup are all BIGINT. */
  private def q132Oracle(bits: Int): String = {
    val nMinus1 = (1L << bits) - 1
    val levels = ((bits - 1) to 0 by -1).map { i =>
      val s2 = 1L << (2 * i)
      s"""h$i AS (SELECT l_orderkey,
         |  d + $s2 * xor(3 * ((x >> $i) & 1), (y >> $i) & 1) AS d,
         |  CASE WHEN ((y >> $i) & 1) = 0 THEN
         |    CASE WHEN ((x >> $i) & 1) = 1 THEN $nMinus1 - y ELSE y END
         |    ELSE x END AS x,
         |  CASE WHEN ((y >> $i) & 1) = 0 THEN
         |    CASE WHEN ((x >> $i) & 1) = 1 THEN $nMinus1 - x ELSE x END
         |    ELSE y END AS y
         |FROM h${i + 1})""".stripMargin
    }.mkString(",\n")
    s"""WITH h$bits AS (SELECT l_orderkey,
       |  CAST(l_partkey & $nMinus1 AS BIGINT) AS x,
       |  CAST(l_suppkey & $nMinus1 AS BIGINT) AS y,
       |  CAST(0 AS BIGINT) AS d FROM lineitem),
       |$levels
       |SELECT d // 1024 AS bucket, count(*) AS n,
       |  CAST(min(d) AS BIGINT) AS min_code, CAST(max(d) AS BIGINT) AS max_code,
       |  CAST(sum(l_orderkey) AS BIGINT) AS order_sum
       |FROM h0 GROUP BY 1""".stripMargin
  }
}
