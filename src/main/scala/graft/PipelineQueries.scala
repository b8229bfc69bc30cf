package graft

import org.apache.spark.sql.functions._

import graft.operators.{Delivery, SnapshotJob, SnapshotPipeline}
import graft.sources.{LocalKeyService, SnapshotFixture}
import graft.streaming.EventStream

/** Snapshot-pipeline parity operators (scan → anti-join → decrypt →
  * decompress → parse → deliver; SURVEY.md §2.1-2.5) in the driver's
  * inventory. The end-to-end run uses a deterministic local fixture
  * (DuckDB can't AES-CTR → rows-only check; full invariants live in
  * SnapshotJobSpec). The join/regex/rollup *shapes* are additionally
  * exercised over the parquet testdata with DuckDB oracles.
  */
object PipelineQueries {
  import Registry.Q

  /** events re-written µs-normalized for the streaming file source (the
    * raw parquet is TIMESTAMP(NANOS), which the stream reader rejects);
    * generate-once per sf dir + content fingerprint, marker-guarded.
    * Shared by the streaming queries (q70/q95/q115/...). */
  private def normalizedEventsDir(spark: org.apache.spark.sql.SparkSession,
      dir: String): String = {
    val events = Tables.load(spark, dir, "events")
    val normDir = s"/tmp/graft-stream-${dir.replaceAll("[^a-zA-Z0-9]", "_")}" +
      s"-${Tables.fingerprint(events, "event_id", s"$dir/events")}"
    if (!new java.io.File(s"$normDir/_SUCCESS").exists()) {
      events.write.mode("overwrite").parquet(normDir)
    }
    normDir
  }

  /** Events of watermark-CLOSED "1 day" windows — the Spark-side twin of
    * the oracles' emission rule (RelationalQueries5.windowAdmitted:
    * day_start + 25 h ≤ max ts), shared by q135/q136 so the rule lives
    * once per engine. */
  private def admittedEvents(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val e = Tables.load(spark, dir, "events")
    e.crossJoin(broadcast(e.agg(max(col("ts")).as("_mx"))))
      .filter(expr("date_trunc('DAY', ts) + INTERVAL 25 HOURS <= _mx"))
      .drop("_mx")
  }

  /** The q129 streaming-build input: the q119 build side written once
    * per sf dir + content fingerprint as a parquet directory the
    * file-stream source can replay (marker-guarded, like
    * [[normalizedEventsDir]]). */
  private def bloomBuildDir(spark: org.apache.spark.sql.SparkSession,
      dir: String): String = {
    val keys = RelationalQueries5.buildingCustomerKeys(spark, dir)
    val d = s"/tmp/graft-bloomstream-${dir.replaceAll("[^a-zA-Z0-9]", "_")}" +
      s"-${Tables.fingerprint(keys, "key", s"$dir/bloomkeys")}"
    if (!new java.io.File(s"$d/_SUCCESS").exists()) {
      keys.write.mode("overwrite").parquet(d)
    }
    d
  }

  val all: Seq[Q] = Seq(
    // Full ingest pipeline: binaryFile scan + sidecar metadata →
    // topic parse → key broadcast → AES-CTR decrypt → gunzip → JSONL
    // explode → typed Mongo-document rows. Output: per-topic record/file
    // counts + version histogram over parsed fields.
    Q("q50_pipeline_records",
      (spark, dir) => {
        // the reference's integration workload: 100 files × 1,000 records
        // per topic run (s3_files.py:25-26) — generated once, cached
        val fixture = "/tmp/graft-fixture-q50"
        SnapshotFixture.generate(fixture, SnapshotFixture.defaultTopics(100, 1000))
        SnapshotJob.records(spark, fixture, LocalKeyService)
          .groupBy(col("topic"), col("record._version").as("version"))
          .agg(count(lit(1)).as("n_records"),
            countDistinct(col("fileName")).as("n_files"),
            min(col("record._id.citizenId")).as("first_id"))
      },
      // hash-exact via the fixture's pre-encryption ground truth
      // (truth.csv is written by the generator from its own arithmetic,
      // never through the decrypt path) — AES-CTR + gunzip + JSONL
      // explode + typed parse all sit between the two sides.
      Some("""SELECT topic, version, COUNT(*) AS n_records,
             |  COUNT(DISTINCT fileName) AS n_files,
             |  MIN(citizenId) AS first_id
             |FROM read_csv('/tmp/graft-fixture-q50/truth.csv', header=true,
             |  columns={'topic':'VARCHAR','fileName':'VARCHAR',
             |           'version':'INTEGER','citizenId':'VARCHAR'})
             |GROUP BY topic, version""".stripMargin)),

    // F1 as an oracle-checked shape: membership anti-join of a scan
    // against a "finished" set (deterministic subset of documents).
    Q("q51_finished_antijoin",
      (spark, dir) => {
        val d = Tables.load(spark, dir, "documents")
        val finished = d.filter(col("doc_id") % 3 === 0).select(col("doc_id"))
        d.join(finished, Seq("doc_id"), "left_anti")
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_fresh"), sum(col("doc_id")).as("id_sum"))
      },
      Some("""SELECT source, COUNT(*) AS n_fresh, CAST(SUM(doc_id) AS BIGINT) AS id_sum
             |FROM documents WHERE doc_id NOT IN (
             |  SELECT doc_id FROM documents WHERE doc_id % 3 = 0)
             |GROUP BY source""".stripMargin)),

    // M4/F3 as an oracle-checked shape: the reference's filename grammar
    // applied to synthesized names; invalid rows quarantine as ''.
    Q("q52_topic_parse",
      (spark, dir) => {
        val d = Tables.load(spark, dir, "documents")
        val fn = concat(lit("db."), col("lang"), lit("."), col("source"),
          lit("-045-050-"), lpad(col("doc_id").cast("string"), 6, "0"),
          lit(".txt.gz"))
        val named = d.select(col("doc_id"), fn.as("fileName"))
        SnapshotPipeline.withTopic(named)
          .groupBy(col("database"), col("collection"), col("topic"))
          .agg(count(lit(1)).as("n"), min(col("doc_id")).as("min_doc"))
      },
      Some("""WITH named AS (
             |  SELECT doc_id,
             |    'db.' || lang || '.' || source || '-045-050-' ||
             |      lpad(CAST(doc_id AS VARCHAR), 6, '0') || '.txt.gz' AS fileName
             |  FROM documents)
             |SELECT regexp_extract(fileName,
             |    '^(?:\w+\.)?([\w-]+)\.([\w-]+)-\d{3}-\d{3}-\d+\.\w+\.\w+$', 1) AS database,
             |  regexp_extract(fileName,
             |    '^(?:\w+\.)?([\w-]+)\.([\w-]+)-\d{3}-\d{3}-\d+\.\w+\.\w+$', 2) AS collection,
             |  CASE WHEN fileName LIKE 'db.%' THEN 'db.' ELSE '' END ||
             |    regexp_extract(fileName, '^(?:\w+\.)?([\w-]+)\.([\w-]+)-\d{3}-\d{3}-\d+\.\w+\.\w+$', 1)
             |    || '.' ||
             |    regexp_extract(fileName, '^(?:\w+\.)?([\w-]+)\.([\w-]+)-\d{3}-\d{3}-\d+\.\w+\.\w+$', 2)
             |    AS topic,
             |  COUNT(*) AS n, CAST(MIN(doc_id) AS BIGINT) AS min_doc
             |FROM named GROUP BY 1, 2, 3""".stripMargin)),

    // A1-A3 as an oracle-checked shape: delivery counts vs an expected
    // manifest, per-key status decision, then all/any completion rollup
    // (bool_and/bool_or with partial aggregation).
    Q("q53_status_rollup",
      (spark, dir) => {
        val e = Tables.load(spark, dir, "events")
        val sent = e.filter(col("event_type") === "purchase")
          .groupBy(col("user_id")).agg(count(lit(1)).as("files_sent"))
        val expected = e.filter(col("event_type") === "view")
          .groupBy(col("user_id")).agg(count(lit(1)).as("files_expected"))
        val status = expected.join(sent, Seq("user_id"), "left")
          .withColumn("files_sent", coalesce(col("files_sent"), lit(0L)))
          .withColumn("status",
            when(col("files_expected") === 0, "Received")
              .when(col("files_sent") >= col("files_expected"), "Sent")
              .otherwise("In_Progress"))
        status.groupBy(col("status"))
          .agg(count(lit(1)).as("n_collections"),
            sum(col("files_sent")).as("total_sent"))
      },
      Some("""WITH sent AS (
             |  SELECT user_id, COUNT(*) AS files_sent FROM events
             |  WHERE event_type = 'purchase' GROUP BY user_id),
             |expected AS (
             |  SELECT user_id, COUNT(*) AS files_expected FROM events
             |  WHERE event_type = 'view' GROUP BY user_id),
             |status AS (
             |  SELECT e.user_id, COALESCE(s.files_sent, 0) AS files_sent,
             |    CASE WHEN e.files_expected = 0 THEN 'Received'
             |      WHEN COALESCE(s.files_sent, 0) >= e.files_expected THEN 'Sent'
             |      ELSE 'In_Progress' END AS status
             |  FROM expected e LEFT JOIN sent s USING (user_id))
             |SELECT status, COUNT(*) AS n_collections,
             |  CAST(SUM(files_sent) AS BIGINT) AS total_sent
             |FROM status GROUP BY status""".stripMargin)),

    // A3's bool_and/bool_or rollup itself, oracle-checked.
    Q("q54_completion_rollup",
      (spark, dir) => {
        val e = Tables.load(spark, dir, "events")
        e.groupBy(col("user_id"))
          .agg(bool_and(col("event_type") =!= "error").as("all_ok"),
            bool_or(col("event_type") === "error").as("any_failed"))
          .withColumn("completion",
            when(col("all_ok"), "COMPLETED_SUCCESSFULLY")
              .when(col("any_failed"), "COMPLETED_UNSUCCESSFULLY")
              .otherwise("NOT_COMPLETED"))
          .groupBy(col("completion")).agg(count(lit(1)).as("n_users"))
      },
      Some("""SELECT CASE WHEN all_ok THEN 'COMPLETED_SUCCESSFULLY'
             |  WHEN any_failed THEN 'COMPLETED_UNSUCCESSFULLY'
             |  ELSE 'NOT_COMPLETED' END AS completion, COUNT(*) AS n_users
             |FROM (SELECT user_id, bool_and(event_type <> 'error') AS all_ok,
             |        bool_or(event_type = 'error') AS any_failed
             |      FROM events GROUP BY user_id) g
             |GROUP BY 1""".stripMargin)),

    // Backward as-of join (custom operator — Spark has no native ASOF):
    // for every click, the latest prior purchase value per user. Oracle:
    // DuckDB's native ASOF LEFT JOIN.
    Q("q71_asof_join",
      (spark, dir) => {
        val e = Tables.load(spark, dir, "events")
        val clicks = e.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("event_id"))
        val purchases = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("value"))
        graft.operators.AsOfJoin
          .asofBackward(clicks, purchases, Seq("user_id"), "ts", Seq("value"))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_clicks"),
            count(col("asof_value")).as("n_matched"),
            round(sum(coalesce(col("asof_value"), lit(0.0))), 4).as("value_sum"))
      },
      Some("""WITH clicks AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'),
             |purchases AS (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase')
             |SELECT c.user_id, COUNT(*) AS n_clicks, COUNT(p.value) AS n_matched,
             |ROUND(SUM(COALESCE(p.value, 0.0)), 4) AS value_sum
             |FROM clicks c ASOF LEFT JOIN purchases p
             |ON c.user_id = p.user_id AND p.ts <= c.ts
             |GROUP BY c.user_id""".stripMargin)),

    // The stream-stream attribution join's batch form, oracled: purchases
    // matched to the clicks that preceded them by ≤30 min per user.
    Q("q78_purchase_attribution",
      (spark, dir) => {
        val e = Tables.load(spark, dir, "events")
        val joined = EventStream.purchaseAttribution(
          e.filter(col("event_type") === "click"),
          e.filter(col("event_type") === "purchase"))
        joined.groupBy(col("user_id"))
          .agg(countDistinct(col("purchase_id")).as("attributed_purchases"),
            count(lit(1)).as("click_purchase_pairs"),
            round(sum(col("value")), 4).as("attributed_value"))
      },
      Some("""SELECT p.user_id AS user_id,
             |COUNT(DISTINCT p.event_id) AS attributed_purchases,
             |COUNT(*) AS click_purchase_pairs,
             |ROUND(SUM(p.value), 4) AS attributed_value
             |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
             |JOIN (SELECT * FROM events WHERE event_type = 'click') c
             |ON c.user_id = p.user_id AND c.ts <= p.ts
             |AND c.ts >= p.ts - INTERVAL 30 MINUTE
             |GROUP BY p.user_id""".stripMargin)),

    // Funnel analysis: furthest ordered stage per user (first view →
    // first click within 48 h of that view → first purchase within 48 h
    // of that click). Each stage is a conditional-min aggregate plus a
    // left join — no per-user sorting, no UDF; users who never view land
    // in stage 0. (Unwindowed, the dense synthetic corpus converts every
    // user; the 48 h constraint yields a discriminating 54/38/58 split.)
    Q("q101_funnel",
      (spark, dir) => {
        // ALL window comparisons in epoch-ms: Spark floors events to µs,
        // DuckDB sees the raw nanos — raw-timestamp inequalities can flip
        // on sub-µs components (the Tables.loadEvents invariant); ms
        // floors are identical in both engines.
        val e = Tables.load(spark, dir, "events")
        val winMs = 48L * 3600 * 1000
        val v = e.groupBy(col("user_id"))
          .agg(min(when(col("event_type") === "view",
            unix_millis(col("ts")))).as("v"))
        val clicks = e.filter(col("event_type") === "click")
          .select(col("user_id"), unix_millis(col("ts")).as("cts"))
        val c = v.join(clicks, Seq("user_id"), "left")
          .groupBy(col("user_id"), col("v"))
          .agg(min(when(col("cts") >= col("v") &&
            col("cts") <= col("v") + winMs, col("cts"))).as("c"))
        val purchases = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), unix_millis(col("ts")).as("pts"))
        val p = c.join(purchases, Seq("user_id"), "left")
          .groupBy(col("user_id"), col("v"), col("c"))
          .agg(min(when(col("pts") >= col("c") &&
            col("pts") <= col("c") + winMs, col("pts"))).as("p"))
        p.select(when(col("p").isNotNull, 3)
            .when(col("c").isNotNull, 2)
            .when(col("v").isNotNull, 1)
            .otherwise(0).as("stage"))
          .groupBy(col("stage"))
          .agg(count(lit(1)).as("n_users"))
      },
      Some("""WITH v AS (
             |  SELECT user_id,
             |    min(CASE WHEN event_type = 'view' THEN epoch_ms(ts) END) AS v
             |  FROM events GROUP BY user_id),
             |c AS (
             |  SELECT v.user_id, v.v, min(CASE WHEN epoch_ms(e.ts) >= v.v
             |    AND epoch_ms(e.ts) <= v.v + 172800000 THEN epoch_ms(e.ts) END) AS c
             |  FROM v LEFT JOIN events e
             |    ON e.user_id = v.user_id AND e.event_type = 'click'
             |  GROUP BY v.user_id, v.v),
             |p AS (
             |  SELECT c.user_id, c.v, c.c, min(CASE WHEN epoch_ms(e.ts) >= c.c
             |    AND epoch_ms(e.ts) <= c.c + 172800000 THEN epoch_ms(e.ts) END) AS p
             |  FROM c LEFT JOIN events e
             |    ON e.user_id = c.user_id AND e.event_type = 'purchase'
             |  GROUP BY c.user_id, c.v, c.c)
             |SELECT CASE WHEN p IS NOT NULL THEN 3
             |  WHEN c IS NOT NULL THEN 2
             |  WHEN v IS NOT NULL THEN 1 ELSE 0 END AS stage,
             |  count(*) AS n_users
             |FROM p GROUP BY 1""".stripMargin)),

    // Exact event-time sessionization as a stream: flatMapGroupsWithState
    // buffers per-user events under an event-time timeout and emits each
    // session once the watermark passes its end + gap. Replayed in one
    // file-source batch (watermark 0 during the data batch, so nothing is
    // late-dropped), every emission happens in the trailing no-data batch
    // via timeouts, which fire on watermark STRICTLY past the horizon —
    // hence the strict < in the oracle's closed-session restriction.
    Q("q95_streaming_sessions",
      (spark, dir) => {
        EventStream.runToCompletion(spark, normalizedEventsDir(spark, dir),
          df => EventStream.sessionizeEventTime(spark, df,
            watermarkDelay = "45 minutes").toDF(),
          org.apache.spark.sql.streaming.OutputMode.Append,
          s"q95_${math.abs(dir.hashCode)}")
      },
      Some("""WITH gapped AS (
             |  SELECT user_id, ts, event_id,
             |    CASE WHEN epoch_ms(ts) - epoch_ms(LAG(ts) OVER w) > 1800000
             |      THEN 1 ELSE 0 END AS is_new
             |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |sessions AS (
             |  SELECT user_id, ts,
             |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
             |  FROM gapped),
             |per_session AS (
             |  SELECT user_id, sid, epoch_ms(MIN(ts)) AS session_start_ms,
             |    epoch_ms(MAX(ts)) AS session_end_ms, COUNT(*) AS n_events
             |  FROM sessions GROUP BY user_id, sid),
             |wm AS (SELECT epoch_ms(MAX(ts)) - 2700000 AS w FROM events)
             |SELECT user_id, session_start_ms, session_end_ms, n_events
             |FROM per_session, wm
             |WHERE session_end_ms + 1800000 < w""".stripMargin)),

    // Structured Streaming surface: the events table replayed as a file
    // stream through the SAME windowed-agg transform as the batch form,
    // run to completion via the memory sink. Oracle: the batch equivalent
    // restricted to watermark-closed windows (what Append mode emits).
    Q("q70_streaming_window",
      (spark, dir) => {
        EventStream.runToCompletion(spark, normalizedEventsDir(spark, dir),
          EventStream.hourlyTypeCounts,
          org.apache.spark.sql.streaming.OutputMode.Append,
          s"q70_${math.abs(dir.hashCode)}")
      },
      Some("""WITH mx AS (SELECT max(ts) AS m FROM events)
             |SELECT date_trunc('hour', ts) AS hour_start, event_type, COUNT(*) AS n
             |FROM events, mx
             |GROUP BY 1, 2, mx.m
             |HAVING date_trunc('hour', ts) + INTERVAL 1 HOUR + INTERVAL 2 HOUR <= mx.m""".stripMargin)),

    // Streaming KMV sketch under the oracle gate: the events table
    // replayed as a file stream through kmvDistinctStream (Update mode).
    // The estimate is monotone non-decreasing as values arrive (the k-th
    // smallest hash only ever decreases), so max over the Update-mode
    // emissions IS the final state — which equals the batch sketch
    // bit-for-bit (shared insert kernel, inserts commute), so the oracle
    // is q106's chain minus the exact-count column. This puts the
    // STREAMING sketch path itself, not just its spec parity, under the
    // cross-engine hash gate every round.
    Q("q115_streaming_kmv",
      (spark, dir) => {
        EventStream.runToCompletion(spark, normalizedEventsDir(spark, dir),
          df => EventStream.kmvDistinctStream(spark, df,
            "event_type", "user_id", 64).toDF(),
          org.apache.spark.sql.streaming.OutputMode.Update,
          s"q115_${math.abs(dir.hashCode)}")
          .groupBy(col("group"))
          .agg(max(col("kmv_estimate")).as("m"))
          .select(col("group").as("event_type"),
            round(col("m"), 4).as("kmv_estimate"))
      },
      Some(RelationalQueries5.kmvEventsOracle(64, includeExact = false))),

    // Streaming HLL register sketch under the oracle gate — q115's
    // pattern for the fixed-memory sketch: registers only grow, so the
    // estimate is monotone non-decreasing and max over the Update-mode
    // emissions IS the final state, which equals batch hllRaw bit-for-bit
    // (shared hash/register/estimator kernels, register max commutes
    // across any batch split). Oracle = q120's chain minus the exact
    // column.
    Q("q122_streaming_hll",
      (spark, dir) => {
        EventStream.runToCompletion(spark, normalizedEventsDir(spark, dir),
          df => EventStream.hllDistinctStream(spark, df,
            "event_type", "event_id").toDF(),
          org.apache.spark.sql.streaming.OutputMode.Update,
          s"q122_${math.abs(dir.hashCode)}",
          shufflePartitions = Some(8))
          .groupBy(col("group"))
          .agg(max(col("hll_estimate")).as("m"))
          .select(col("group").as("event_type"),
            round(col("m"), 4).as("hll_estimate"))
      },
      Some(RelationalQueries5.hllEventsOracle(includeExact = false))),

    // Streaming Bloom build under the oracle gate: a runtime filter
    // constructed from a STREAM of seen keys (the incremental-ingest
    // form — each batch of new keys ORs its positions in; position-set
    // union commutes, so the streamed filter equals the batch build
    // exactly and must land on q119's verdicts, false positives
    // included. The position table's key set IS the filter; counts are
    // scaffolding for the Update-mode aggregation.
    Q("q129_streaming_bloom",
      (spark, dir) => {
        val posTable = EventStream.runToCompletion(spark,
          bloomBuildDir(spark, dir),
          df => EventStream.bloomPositionsStream(df, "key", 4096, 3),
          org.apache.spark.sql.streaming.OutputMode.Update,
          s"q129_${math.abs(dir.hashCode)}",
          shufflePartitions = Some(8))
        val ps = posTable.select(col("pos")).distinct()
          .collect().map(_.getLong(0))
        val words = graft.operators.Bloom.pack(ps, 4096)
        RelationalQueries5.bloomVerdictGate(spark, dir, words, 4096, 3)
      },
      Some(RelationalQueries5.q119Oracle(4096, 3))),

    // Streaming Count–Min under the oracle gate — the third sketch
    // family's streaming form (KMV: q115, HLL: q122): the counter build
    // streams as a plain Update-mode aggregation (cell counts are
    // monotone, so max over emissions is the final table), then the
    // estimates are computed from the recovered counters exactly as in
    // batch — same output frame as q123, same oracle.
    Q("q127_streaming_countmin",
      (spark, dir) => {
        val cells = EventStream.runToCompletion(spark,
          normalizedEventsDir(spark, dir),
          df => EventStream.cmCountersStream(df, "user_id", 1024, 4),
          org.apache.spark.sql.streaming.OutputMode.Update,
          s"q127_${math.abs(dir.hashCode)}",
          shufflePartitions = Some(8))
          .groupBy(col("r"), col("pos"))
          .agg(max(col("cnt")).as("cnt"))
        graft.operators.Sketches.cmTopKGate(
          Tables.load(spark, dir, "events"), cells, "user_id", 1024, 4)
      },
      Some(RelationalQueries5.cmEventsOracle(1024, 4))),

    // Stream-STREAM interval join under the oracle gate: the events table
    // replayed as a file stream, split into click/purchase substreams, and
    // joined through purchaseAttribution (watermarked interval join — the
    // state-store join operator, not a static broadcast). The file source
    // delivers all files in one trigger and the initial watermark is 0, so
    // nothing is late-dropped and Append emits exactly the full interval
    // join — which the oracle replays as a plain self-join in DuckDB. All
    // aggregates are integer (epoch-ms lags, id sums), so the hash is
    // exact. Batch-split robustness of the join itself is Spark's state
    // machinery (exercised further in StreamingRecoverySpec).
    Q("q117_streaming_interval_join",
      (spark, dir) => {
        EventStream.runToCompletion(spark, normalizedEventsDir(spark, dir),
          df => EventStream.purchaseAttribution(
            df.filter(col("event_type") === "click"),
            df.filter(col("event_type") === "purchase"),
            windowMinutes = 30),
          org.apache.spark.sql.streaming.OutputMode.Append,
          s"q117_${math.abs(dir.hashCode)}",
          // 4 state stores per partition for a stream-stream join; the
          // per-user state is tiny, so fewer partitions = less per-store
          // fixed cost (commit files, maintenance) with no skew risk
          shufflePartitions = Some(8))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_pairs"),
            sum(unix_millis(col("purchase_ts")) - unix_millis(col("click_ts")))
              .as("lag_ms_sum"),
            sum(col("click_id")).as("click_id_sum"),
            sum(col("purchase_id")).as("purchase_id_sum"))
      },
      Some("""SELECT p.user_id AS user_id, count(*) AS n_pairs,
             |  CAST(sum(epoch_ms(p.ts) - epoch_ms(c.ts)) AS BIGINT) AS lag_ms_sum,
             |  CAST(sum(c.event_id) AS BIGINT) AS click_id_sum,
             |  CAST(sum(p.event_id) AS BIGINT) AS purchase_id_sum
             |FROM events p JOIN events c
             |  ON c.user_id = p.user_id
             | AND p.event_type = 'purchase' AND c.event_type = 'click'
             | AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 30 MINUTE
             |GROUP BY 1""".stripMargin)),

    // EVENT-TIME windowed KMV in APPEND mode — the final-only emission
    // form next to q115's running-estimate Update stream: one immutable
    // sketch per (day window, event_type), emitted exactly once when the
    // watermark (max ts − 1 h) passes the window end. The oracle replays
    // the q106 chain per closed window — the stream's final emission
    // must equal the batch sketch over exactly the admitted rows. k=16
    // so the estimator branch (not just the exact-below-k branch)
    // exercises at the per-day cardinalities of the oracle SF.
    Q("q133_streaming_kmv_window",
      (spark, dir) => {
        EventStream.runToCompletion(spark, normalizedEventsDir(spark, dir),
          df => EventStream.kmvWindowed(df, "event_type", "user_id", 16,
            "1 day", "1 hour"),
          org.apache.spark.sql.streaming.OutputMode.Append,
          s"q133_${math.abs(dir.hashCode)}",
          shufflePartitions = Some(8))
          .select(col("window_start").as("day_start"), col("event_type"),
            round(col("kmv_estimate"), 4).as("kmv_estimate"))
      },
      Some(RelationalQueries5.kmvWindowedOracle(16))),

    // STREAMING hash-sample quantiles (Update) — q107's streaming twin,
    // closing the one batch-only member of the deterministic-sketch
    // family. A quantile is NOT monotone over arriving rows (unlike the
    // KMV estimate), so the final state is selected by max_by on the
    // emitted n_seen counter, not max over emissions. Oracle = q107's
    // chain verbatim: shared insert kernel + identical nearest-rank
    // arithmetic ⇒ final stream state equals the batch sample
    // bit-for-bit.
    Q("q167_streaming_quantiles",
      (spark, dir) => {
        val ups = EventStream.runToCompletion(spark,
          normalizedEventsDir(spark, dir),
          df => EventStream.sampleQuantilesStream(spark, df,
            "event_type", "event_id", "value", 256).toDF(),
          org.apache.spark.sql.streaming.OutputMode.Update,
          s"q167_${math.abs(dir.hashCode)}")
        ups.groupBy(col("group"))
          .agg(max_by(struct(col("p50"), col("p90"), col("p99")),
            col("n_seen")).as("q"))
          .select(col("group").as("event_type"), col("q.p50").as("p50"),
            col("q.p90").as("p90"), col("q.p99").as("p99"))
      },
      Some(RelationalQueries5.q107Oracle(256))),

    // EVENT-TIME windowed quantiles (Append) — the q133 discipline on
    // q107's kernel: one immutable k-row sample per (day, event_type),
    // emitted when the watermark passes the window end. Oracle replays
    // the sample chain per closed window under the 25-hour admission
    // rule.
    Q("q168_windowed_quantiles",
      (spark, dir) => {
        EventStream.runToCompletion(spark, normalizedEventsDir(spark, dir),
          df => EventStream.sampleQuantilesWindowed(df, "event_type",
            "event_id", "value", Seq(0.5, 0.9, 0.99), 256, "1 day", "1 hour"),
          org.apache.spark.sql.streaming.OutputMode.Append,
          s"q168_${math.abs(dir.hashCode)}",
          shufflePartitions = Some(8))
          .select(col("window_start").as("day_start"), col("event_type"),
            col("p50"), col("p90"), col("p99"))
      },
      Some(RelationalQueries5.sampleQuantilesWindowedOracle(256))),

    // EVENT-TIME windowed HLL (Append): the stream emits final (window,
    // group, register) rows; the estimate folds over them BATCH-side
    // through the hllRaw kernel (chaining a second streaming agg is the
    // multi-stateful shape to avoid). Oracle = q120's chain per closed
    // window.
    Q("q134_streaming_hll_window",
      (spark, dir) => {
        val regs = EventStream.runToCompletion(spark,
          normalizedEventsDir(spark, dir),
          df => EventStream.hllRegsWindowed(df, "event_type", "event_id",
            "1 day", "1 hour"),
          org.apache.spark.sql.streaming.OutputMode.Append,
          s"q134_${math.abs(dir.hashCode)}",
          shufflePartitions = Some(8))
        graft.operators.Sketches.hllEstimateOver(
            regs.withColumnRenamed("window_start", "day_start"),
            Seq("day_start", "event_type"))
          .select(col("day_start"), col("event_type"),
            round(col("hll_estimate"), 4).as("hll_estimate"))
      },
      Some(RelationalQueries5.hllWindowedOracle)),

    // EVENT-TIME windowed Count–Min (Append) + the merge property that
    // makes per-window sketches USEFUL: the emitted windows' cells are
    // summed back into one counter table (CM merges by addition), which
    // must equal the batch build over exactly the closed windows' rows —
    // then the q123 gate shape over that restriction. Both the windowed
    // emission AND the cross-window merge sit under one oracle.
    Q("q135_streaming_cm_window",
      (spark, dir) => {
        val cells = EventStream.runToCompletion(spark,
          normalizedEventsDir(spark, dir),
          df => EventStream.cmCountersWindowed(df, "user_id", 1024, 4,
            "1 day", "1 hour"),
          org.apache.spark.sql.streaming.OutputMode.Append,
          s"q135_${math.abs(dir.hashCode)}",
          shufflePartitions = Some(8))
        val merged = cells.groupBy(col("r"), col("pos"))
          .agg(sum(col("cnt")).as("cnt"))
        graft.operators.Sketches.cmTopKGate(
          admittedEvents(spark, dir), merged, "user_id", 1024, 4)
      },
      Some(RelationalQueries5.cmWindowAdmittedOracle(1024, 4))),

    // EVENT-TIME windowed Bloom build (Append) — q129's incremental-
    // ingest filter on event time: each closed day window emits its
    // position set exactly once; the union of the closed windows' sets
    // IS the filter over their keys (position-set union commutes), so
    // probing EVERY user against the merged filter must land on the
    // batch verdict chain over the admitted rows, false positives
    // included. Users seen only in unclosed windows are true negatives
    // the filter may still pass — that is the FP column the oracle
    // hashes. Completes the Append-mode family: all four
    // filter/sketch structures now stream final-only per window.
    Q("q136_streaming_bloom_window",
      (spark, dir) => {
        val cells = EventStream.runToCompletion(spark,
          normalizedEventsDir(spark, dir),
          df => EventStream.bloomPositionsWindowed(df, "user_id", 4096, 3,
            "1 day", "1 hour"),
          org.apache.spark.sql.streaming.OutputMode.Append,
          s"q136_${math.abs(dir.hashCode)}",
          shufflePartitions = Some(8))
        val ps = cells.select(col("pos")).distinct()
          .collect().map(_.getLong(0))
        val words = graft.operators.Bloom.pack(ps, 4096)
        val probe = Tables.load(spark, dir, "events")
          .filter(col("user_id").isNotNull)
          .select(col("user_id").as("key")).distinct()
        val admitted = admittedEvents(spark, dir)
          .filter(col("user_id").isNotNull)
          .select(col("user_id").as("key")).distinct()
        RelationalQueries5.bloomVerdictFrame(probe, admitted, words, 4096, 3)
      },
      Some(RelationalQueries5.bloomWindowAdmittedOracle(4096, 3))),

    // Snapshot-diff (Diff.snapshotDiff): added/removed/changed between
    // two runs of a collection — the weekly analytic over the reference's
    // incremental re-run layout (FinishedFilterProcessor.kt:17-27). Two
    // runs are modeled as deterministic views of documents: run A drops
    // doc_id % 7 == 0, run B drops % 5 == 0 and rewrites text for
    // % 3 == 0 — so all three classes are populated and every verdict is
    // derivable. The Spark side classifies via per-column sha256
    // fingerprints; the oracle classifies by DIRECT value comparison
    // (IS DISTINCT FROM) — hash-compare must equal value-compare row for
    // row, or the gate breaks.
    Q("q146_snapshot_diff",
      (spark, dir) => {
        val d = Tables.load(spark, dir, "documents")
        val runA = d.filter(col("doc_id") % 7 =!= 0)
        val runB = d.filter(col("doc_id") % 5 =!= 0)
          .withColumn("text", when(col("doc_id") % 3 === 0,
            concat(col("text"), lit(" v2"))).otherwise(col("text")))
        graft.operators.Diff.snapshotDiff(runA, runB, Seq("doc_id"),
          Seq("text", "lang", "source", "n_chars"))
      },
      Some("""WITH a AS (SELECT * FROM documents WHERE doc_id % 7 <> 0),
             |b AS (SELECT doc_id,
             |    CASE WHEN doc_id % 3 = 0 THEN text || ' v2' ELSE text END AS text,
             |    lang, source, n_chars
             |  FROM documents WHERE doc_id % 5 <> 0)
             |SELECT b.doc_id, 'added' AS status FROM b
             |  WHERE NOT EXISTS (SELECT 1 FROM a WHERE a.doc_id = b.doc_id)
             |UNION ALL
             |SELECT a.doc_id, 'removed' FROM a
             |  WHERE NOT EXISTS (SELECT 1 FROM b WHERE b.doc_id = a.doc_id)
             |UNION ALL
             |SELECT a.doc_id, 'changed' FROM a JOIN b USING (doc_id)
             |  WHERE a.text IS DISTINCT FROM b.text
             |     OR a.lang IS DISTINCT FROM b.lang
             |     OR a.source IS DISTINCT FROM b.source
             |     OR a.n_chars IS DISTINCT FROM b.n_chars""".stripMargin)),
  )
}
