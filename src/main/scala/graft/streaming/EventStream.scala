package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming surface (SURVEY.md §1.3): the reference's
  * re-run-with-marker-anti-join loop is the batch form of a checkpointed
  * file stream; these operators are the streaming form.
  *
  * All transforms are written against plain DataFrames so the SAME
  * function serves batch and streaming (parity provable in tests:
  * stream.processAllAvailable == batch result).
  */
object EventStream {

  /** Tumbling-window counts with a watermark — the streaming q23.
    * Works on a batch OR streaming events frame. */
  def hourlyTypeCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("hour_start"), col("event_type"), col("n"))

  /** Streaming file-dedup — the F1 anti-join as a stream: `dropDuplicates`
    * over the file key. State is one entry per distinct key and is NOT
    * watermark-evicted (the watermarked ts column is not in the key set) —
    * for file-identity dedup that is the contract: the state mirrors the
    * `.finished` marker prefix, which also grows with delivered files.
    * When keys are time-local and bounded state matters more than exact
    * dedup, `dropDuplicatesWithinWatermark(keyCol)` is the alternative. */
  def dedupeByKey(df: DataFrame, keyCol: String, tsCol: String): DataFrame =
    df.withWatermark(tsCol, "1 hour").dropDuplicates(keyCol)

  final case class SessionState(count: Long, lastMs: Long, sessions: Long)
  final case class SessionUpdate(user_id: Long, n_events: Long, n_sessions: Long)

  /** Stateful sessionization with mapGroupsWithState — the custom-state
    * form of q24's gaps-and-islands (30-minute gap = new session). Update
    * mode: emits the running per-user (events, sessions) after each batch.
    *
    * Events are sorted WITHIN a batch; an event arriving in a LATER batch
    * with an earlier timestamp (file order ≠ time order) is counted into
    * the current session and never rewinds lastMs — exact cross-batch
    * ordering needs event-time buffering (flatMapGroupsWithState with an
    * event-time timeout + watermark), which this deliberately trades away
    * for O(1) state. Batch parity holds whenever a user's events land
    * time-ordered across batches (always true for single-batch replays). */
  def sessionize(spark: SparkSession, events: DataFrame,
      gapMs: Long = 30L * 60 * 1000): org.apache.spark.sql.Dataset[SessionUpdate] = {
    import spark.implicits._
    events.select(col("user_id").cast("long").as("user_id"),
        unix_millis(col("ts")).as("ms"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[SessionState, SessionUpdate](
        GroupStateTimeout.NoTimeout) {
        case (user, rows, state: GroupState[SessionState]) =>
          val sorted = rows.map(_._2).toSeq.sorted
          var st = state.getOption.getOrElse(SessionState(0L, Long.MinValue, 0L))
          sorted.foreach { ms =>
            val newSession = st.lastMs == Long.MinValue || ms - st.lastMs > gapMs
            st = SessionState(st.count + 1, math.max(st.lastMs, ms),
              st.sessions + (if (newSession) 1 else 0))
          }
          state.update(st)
          SessionUpdate(user, st.count, st.sessions)
      }
  }

  final case class SessionBuf(eventsMs: Seq[Long])
  final case class ClosedSession(user_id: Long, session_start_ms: Long,
      session_end_ms: Long, n_events: Long)

  /** EXACT event-time sessionization: flatMapGroupsWithState with an
    * event-time timeout. Where [[sessionize]] trades cross-batch ordering
    * for O(1) state, this buffers events per user until the WATERMARK
    * passes session-end + gap, then emits the closed session — late or
    * out-of-order events (within the watermark delay) land in the right
    * session regardless of which micro-batch delivered them.
    *
    * State is bounded by the watermark horizon: an event is buffered for
    * at most (watermark delay + gap) of event time, then its session
    * closes and the buffer shrinks. Emission is Append-mode (closed
    * sessions are immutable facts, exactly-once per session).
    *
    * Batch parity: closed sessions equal the q24 gaps-and-islands
    * decomposition restricted to sessions whose end + gap ≤ final
    * watermark — proven in StreamingSpec with deliberately out-of-order
    * batches. */
  def sessionizeEventTime(spark: SparkSession, events: DataFrame,
      gapMs: Long = 30L * 60 * 1000,
      watermarkDelay: String = "1 hour"): org.apache.spark.sql.Dataset[ClosedSession] = {
    import spark.implicits._
    // the watermarked COLUMN itself must reach the stateful operator
    // (projecting it into unix_millis strips the watermark tag and the
    // analyzer rejects EventTimeTimeout) — convert inside the lambda
    events
      .withWatermark("ts", watermarkDelay)
      .select(col("user_id").cast("long").as("user_id"), col("ts"))
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionBuf, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (user, rows, state: GroupState[SessionBuf]) =>
          val buffered = state.getOption.map(_.eventsMs).getOrElse(Seq.empty)
          val all = (buffered ++ rows.map(_._2.getTime)).sorted
          if (all.isEmpty) { state.remove(); Iterator.empty }
          else {
            // split at gaps, close every session the watermark has passed
            val wm = state.getCurrentWatermarkMs()
            val sessions = all.foldLeft(List.empty[List[Long]]) {
              case (acc, ms) => acc match {
                case head :: tail if ms - head.head <= gapMs =>
                  (ms :: head) :: tail // head of inner list = last event
                case _ => List(ms) :: acc
              }
            }.map(_.reverse).reverse
            // STRICT <, matching the timeout trigger (wm strictly past the
            // horizon): with <= a sibling session's timeout could emit a
            // horizon==wm session that a single-session user would never
            // emit — inconsistent, and it would break q95's oracle, whose
            // restriction is strict for exactly this reason
            val (closed, open) = sessions.partition(_.last + gapMs < wm)
            if (open.isEmpty) state.remove()
            else {
              state.update(SessionBuf(open.flatten))
              // fire when the watermark passes the EARLIEST open session's
              // horizon — keying the timeout to the latest event would let
              // an always-active user hold its old sessions (and their
              // state) hostage indefinitely. Partition guarantees
              // min > wm, which setTimeoutTimestamp requires.
              state.setTimeoutTimestamp(open.map(_.last + gapMs).min)
            }
            closed.iterator.map(s =>
              ClosedSession(user, s.head, s.last, s.length.toLong))
          }
      }
  }

  final case class QuantileState(n: Long,
    sample: List[graft.plans.BottomKAggregator.HashedValue])
  final case class QuantileUpdate(group: String, n_seen: Long,
    p50: Double, p90: Double, p99: Double)

  /** STREAMING hash-sample quantiles (Update mode) — q107's streaming
    * twin, completing the deterministic-sketch family's batch/stream
    * pairing (KMV q106→q115, HLL q120→q122, CM q123→q127, Bloom
    * q119→q129; quantiles were the one batch-only member). Per-group
    * state is the bottom-k row sample itself (k (hash, value) pairs,
    * bounded), folded with the SAME insert kernel as the batch
    * aggregator ([[graft.plans.BottomKAggregator.insertSample]] — one
    * definition, so batch and stream can never diverge), and the
    * nearest-rank selection is the identical floor(q·(n−1)) arithmetic.
    *
    * Unlike KMV, a quantile is NOT monotone over arriving rows — max
    * over Update emissions is meaningless. Each emission therefore
    * carries n_seen (accepted-row count, strictly monotone), and the
    * FINAL state is the row with max n_seen per group (the q167 gate
    * takes max_by). */
  def sampleQuantilesStream(spark: SparkSession, df: DataFrame,
      groupCol: String, idCol: String, valueCol: String,
      k: Int = 256): org.apache.spark.sql.Dataset[QuantileUpdate] = {
    import spark.implicits._
    import graft.plans.BottomKAggregator.{HashedValue, insertSample}
    val h = graft.operators.Sketches.hashInput(df, idCol)
    df.filter(col(idCol).isNotNull && col(valueCol).isNotNull)
      .select(col(groupCol).cast("string").as("g"), h.as("h"),
        col(valueCol).cast("double").as("v"))
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[QuantileState, QuantileUpdate](
        GroupStateTimeout.NoTimeout) {
        case (group, rows, state: GroupState[QuantileState]) =>
          val st = state.getOption.getOrElse(QuantileState(0L, Nil))
          var n = st.n
          val merged = rows.foldLeft(st.sample) { (buf, r) =>
            n += 1; insertSample(buf, HashedValue(r._2, r._3), k)
          }
          state.update(QuantileState(n, merged))
          val sorted = merged.map(_.v).sorted.toIndexedSeq
          def sel(q: Double): Double =
            sorted(math.floor(q * (sorted.size - 1)).toInt)
          QuantileUpdate(group, n, sel(0.5), sel(0.9), sel(0.99))
      }
  }

  /** EVENT-TIME windowed hash-sample quantiles (Append): one immutable
    * per-(window, group) sample, emitted when the watermark passes the
    * window end — the q133 discipline applied to q107's kernel. ONE
    * stateful aggregation whose state is the k-row sample; sample
    * inserts commute (distinct-by-hash bottom-k), so the emitted window
    * equals the batch sample over exactly the admitted rows. */
  def sampleQuantilesWindowed(df: DataFrame, groupCol: String,
      idCol: String, valueCol: String, qs: Seq[Double], k: Int = 256,
      windowDuration: String = "1 day",
      watermarkDelay: String = "1 hour"): DataFrame = {
    val h = graft.operators.Sketches.hashInput(df, idCol)
    df.filter(col(idCol).isNotNull && col(valueCol).isNotNull)
      .withWatermark("ts", watermarkDelay)
      .select(col("ts"), col(groupCol), h.as("_h"),
        col(valueCol).cast("double").as("_v"))
      .groupBy(window(col("ts"), windowDuration).as("_w"), col(groupCol))
      .agg(graft.plans.BottomKAggregator.bottom_k_sample(k)(
        col("_h"), col("_v")).as("_sample"))
      .withColumn("_sorted", sort_array(col("_sample")))
      .select(col("_w.start").as("window_start") +: col(groupCol) +:
        graft.operators.Sketches.quantileCols(col("_sorted"), qs): _*)
  }

  final case class Scd2State(openFromMs: Long, openType: String,
    buf: Seq[(Long, Long, String)])
  final case class Scd2Interval(user_id: Long, event_type: String,
    valid_from: Long, valid_to: Long)

  /** STREAMING SCD2 upsert — q157's streaming twin (the q152→q156
    * pattern: the batch/stream pair shares one decision rule): per-user
    * event-type state compressed into validity intervals as the events
    * ARRIVE, late and out-of-order within the watermark delay included,
    * via flatMapGroupsWithState with an event-time timeout.
    *
    * Finality argument (what makes Append-mode emission correct): only
    * events with ts ≥ watermark can still arrive, so once the watermark
    * passes a change-point's timestamp, no admissible event can insert
    * before it — every buffered event with ts < wm folds IRREVERSIBLY
    * into the run compression, intervals whose valid_to lands < wm are
    * immutable facts (emitted exactly once), and the interval left open
    * at the frontier carries forward in state (its START is final, its
    * end unknown). Events with ts ≥ wm stay raw in the buffer — state
    * is bounded by the watermark horizon, the sessionizeEventTime
    * argument. An event arriving with ts < wm (late beyond the
    * watermark) is dropped — absorbing it could rewrite an emitted
    * interval; that is the watermark contract, not data loss.
    *
    * Equal-timestamp discipline: ties order by (ts, event_id) — q157's
    * rule — and an interval closing AT the watermark is NOT emitted
    * (strict <): an admissible event with ts == wm could still tie-sort
    * before the closing change and extend the run.
    *
    * Batch parity (the q166 gate): emitted intervals equal the q157
    * batch decomposition restricted to valid_to < final watermark. */
  def scd2Stream(events: DataFrame,
      watermarkDelay: String = "1 hour"): org.apache.spark.sql.Dataset[Scd2Interval] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .select(col("user_id").cast("long").as("user_id"), col("ts"),
        col("event_id").cast("long").as("event_id"),
        col("event_type").cast("string").as("event_type"))
      .as[(Long, java.sql.Timestamp, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Scd2State, Scd2Interval](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (user, rows, state: GroupState[Scd2State]) =>
          val wm = state.getCurrentWatermarkMs()
          val st = state.getOption.getOrElse(Scd2State(Long.MinValue, null, Seq.empty))
          // new admissible rows join the raw buffer. Spark's fMGWS
          // pre-filter already drops rows with ts <= watermark before
          // they reach this handler (observed empirically — see the
          // watermark-zero trap note), so the >= here is a conservative
          // backstop whose equality branch is unreachable; rows seen
          // here always have ts > wm
          val buffered = st.buf ++ rows
            .map(r => (r._2.getTime, r._3, r._4)).filter(_._1 >= wm)
          val sorted = buffered.sortBy(t => (t._1, t._2))
          // fold the FINAL prefix (ts < wm) into run-compressed intervals
          val (finalPfx, still) = sorted.partition(_._1 < wm)
          var openFrom = st.openFromMs
          var openType = st.openType
          val out = Seq.newBuilder[Scd2Interval]
          finalPfx.foreach { case (ms, _, tpe) =>
            if (openType == null) { openFrom = ms; openType = tpe }
            else if (tpe != openType) {
              out += Scd2Interval(user, openType, openFrom, ms)
              openFrom = ms; openType = tpe
            } // same type: run collapse, nothing changes
          }
          state.update(Scd2State(openFrom, openType, still))
          // wake when the watermark strictly passes the earliest raw
          // event — that is the next moment anything new finalizes.
          // min ts ≥ wm, so min+1 > wm (setTimeoutTimestamp's contract).
          if (still.nonEmpty)
            state.setTimeoutTimestamp(math.max(still.map(_._1).min + 1, wm + 1))
          out.result().iterator
      }
  }

  final case class KmvState(ks: List[Long])
  final case class DistinctEstimate(group: String, kmv_estimate: Double)

  /** Eagerly validate a state-TTL duration string: setTimeoutDuration
    * only parses it executor-side per batch, so a typo ("10 minuets")
    * would otherwise fail the streaming query at runtime mid-stream
    * instead of at construction. Validation runs the string through THE
    * parser the runtime uses — a throwaway TestGroupState's
    * setTimeoutDuration (GroupStateImpl.parseDuration, interval syntax
    * like "10 minutes") — because a lookalike parser is exactly how this
    * check once went wrong: JavaUtils.timeStringAsMs accepts "10s" but
    * not "10 minutes", the runtime accepts "10 minutes" but not "10s" —
    * disjoint grammars, so that validator rejected every valid TTL and
    * passed every invalid one.
    *
    * SPARK-VERSION COUPLING, deliberately isolated here: TestGroupState
    * is an Evolving testing API — this one function is the only
    * production-path use, so a Spark upgrade that changes it breaks one
    * compile site (and the "valid TTLs construct" spec catches a
    * behavioral change), not every streaming constructor. */
  private def validateTtl(who: String, groupTtl: Option[String]): Unit =
    groupTtl.foreach { ttl =>
      import org.apache.spark.api.java.Optional
      val probe = org.apache.spark.sql.streaming.TestGroupState.create[Int](
        Optional.empty[Int](), GroupStateTimeout.ProcessingTimeTimeout, 0L,
        Optional.empty[Long](), hasTimedOut = false)
      try probe.setTimeoutDuration(ttl)
      catch { case e: IllegalArgumentException => throw new IllegalArgumentException(
        s"$who: invalid groupTtl '$ttl' (expected e.g. '10 minutes'): " +
          e.getMessage, e) }
    }

  /** STREAMING cardinality estimation: the KMV bottom-k sketch
    * (operators.Sketches) as `mapGroupsWithState` state — per group, the
    * k smallest distinct mix64 hashes seen so far; each micro-batch
    * merges its values in and emits the running distinct-count estimate
    * (Update mode). The state is k longs per group FOREVER — unlike
    * exact streaming distinct (dropDuplicates), whose state grows with
    * the distinct count itself; that is the whole point of a sketch at
    * 100 TB of stream history.
    *
    * Batch parity is exact, not approximate-in-the-same-ballpark: the
    * HASH is `Sketches.hashInput` — the batch sketch's own type-dispatch
    * kernel (integral → mix64, string → mix64∘fnv1a64, other types
    * rejected loudly), applied on the DataFrame side BEFORE the state
    * operator — the insert kernel is shared with the batch aggregator
    * and the estimator is the same IEEE sequence, so after processing
    * the same rows (in any batch split — inserts commute) the stream's
    * final estimate equals `Sketches.kmvDistinct` bit-for-bit (proven in
    * spec for both long- and string-keyed streams). */
  def kmvDistinctStream(spark: SparkSession, df: DataFrame,
      groupCol: String, valueCol: String, k: Int = 64,
      groupTtl: Option[String] = None): org.apache.spark.sql.Dataset[DistinctEstimate] = {
    import spark.implicits._
    validateTtl("kmvDistinctStream", groupTtl)
    // hash + sign-flip on the Column side (same expressions as the batch
    // plan); the state fold then inserts ready-made flipped hashes
    val flipped = graft.operators.Sketches.hashInput(df, valueCol)
      .bitwiseXOR(lit(Long.MinValue))
    val grouped = df
      .filter(col(valueCol).isNotNull) // null: excluded, as in the batch form
      .select(col(groupCol).cast("string").as("g"), flipped.as("h"))
      .as[(String, Long)]
      .groupByKey(_._1)
    groupTtl match {
      case None =>
        grouped.mapGroupsWithState[KmvState, DistinctEstimate](
          GroupStateTimeout.NoTimeout) {
          case (group, rows, state: GroupState[KmvState]) =>
            kmvStateUpdate(k, None)(group, rows, state).next()
        }
      case Some(_) =>
        // opt-in TTL for high-cardinality group columns: per-group state
        // is bounded (k longs) but the group COUNT is not — an idle group
        // (a departed user, a retired topic) otherwise holds its slot
        // forever. A timed-out group's state drops silently; if the group
        // reappears, its sketch restarts (estimates dip until re-filled —
        // the standard trade of expiring sketch state).
        grouped.flatMapGroupsWithState[KmvState, DistinctEstimate](
          OutputMode.Update, GroupStateTimeout.ProcessingTimeTimeout)(
          kmvStateUpdate(k, groupTtl))
    }
  }

  /** The shared per-group state transition for [[kmvDistinctStream]] —
    * package-visible so the TTL branch is unit-testable with
    * `TestGroupState` (a processing-time timeout cannot be fired
    * deterministically through a real streaming query). */
  private[graft] def kmvStateUpdate(k: Int, ttl: Option[String])(
      group: String, rows: Iterator[(String, Long)],
      state: GroupState[KmvState]): Iterator[DistinctEstimate] =
    if (state.hasTimedOut) { state.remove(); Iterator.empty }
    else {
      val merged = rows.foldLeft(
        state.getOption.map(_.ks).getOrElse(Nil)) { (buf, r) =>
        graft.plans.BottomKAggregator.insert(buf, r._2, k)
      }
      state.update(KmvState(merged))
      ttl.foreach(state.setTimeoutDuration)
      Iterator.single(DistinctEstimate(group,
        graft.operators.Sketches.kmvEstimateKernel(merged, k)))
    }

  final case class HllState(regs: Array[Byte])
  final case class HllEstimate(group: String, hll_estimate: Double)

  /** STREAMING HLL: the register sketch ([[graft.operators.Sketches
    * .hllRaw]]) as `mapGroupsWithState` state — per group, 64 bytes of
    * registers FOREVER, merged by max as values arrive; each micro-batch
    * emits the running estimate (Update mode). Registers only grow, so
    * the estimate is monotone non-decreasing and max over the Update
    * emissions IS the final state. Hash and register encoding are the
    * batch operator's own kernels applied Column-side BEFORE the state
    * operator, and the estimator is the batch form's JVM twin, so after
    * the same rows (any batch split — register max commutes) the
    * stream's final estimate equals `hllRaw` bit-for-bit. The
    * fixed-64-byte state is the HLL trade against streaming KMV's
    * k-long list: even cheaper state, no exact-below-k regime. */
  def hllDistinctStream(spark: SparkSession, df: DataFrame,
      groupCol: String, valueCol: String,
      groupTtl: Option[String] = None): org.apache.spark.sql.Dataset[HllEstimate] = {
    import spark.implicits._
    validateTtl("hllDistinctStream", groupTtl)
    val im = graft.operators.Sketches.hllRegUdf(
      graft.operators.Sketches.hashInput(df, valueCol))
    val grouped = df
      .filter(col(valueCol).isNotNull)
      .select(col(groupCol).cast("string").as("g"), im.as("im"))
      .as[(String, Int)]
      .groupByKey(_._1)
    groupTtl match {
      case None =>
        grouped.mapGroupsWithState[HllState, HllEstimate](
          GroupStateTimeout.NoTimeout) {
          case (group, rows, state: GroupState[HllState]) =>
            hllStateUpdate(None)(group, rows, state).next()
        }
      case Some(_) =>
        grouped.flatMapGroupsWithState[HllState, HllEstimate](
          OutputMode.Update, GroupStateTimeout.ProcessingTimeTimeout)(
          hllStateUpdate(groupTtl))
    }
  }

  /** The shared per-group state transition for [[hllDistinctStream]] —
    * package-visible for TestGroupState-driven TTL specs, same contract
    * as [[kmvStateUpdate]]. */
  private[graft] def hllStateUpdate(ttl: Option[String])(
      group: String, rows: Iterator[(String, Int)],
      state: GroupState[HllState]): Iterator[HllEstimate] =
    if (state.hasTimedOut) { state.remove(); Iterator.empty }
    else {
      val regs = state.getOption.map(_.regs.clone())
        .getOrElse(new Array[Byte](64))
      rows.foreach { r =>
        val idx = r._2 >> 8          // im DIV 256 (im >= 0 by encoding)
        val m = (r._2 & 255).toByte  // rho <= 40, fits a byte
        if (m > regs(idx)) regs(idx) = m
      }
      state.update(HllState(regs))
      ttl.foreach(state.setTimeoutDuration)
      Iterator.single(HllEstimate(group,
        graft.operators.Sketches.hllEstimateKernel(regs)))
    }

  /** STREAMING Count–Min: the counter build is a plain streaming
    * aggregation, so the batch operator IS the streaming operator —
    * this delegates to [[graft.operators.Sketches.cmCounters]] verbatim
    * (one kernel; stream/batch parity cannot drift). Run in Update
    * mode: cell counts are monotone non-decreasing, so max over the
    * Update emissions IS the final counter table, which equals the
    * batch build exactly (counts commute). State = one long per
    * touched cell, bounded by d·w. */
  def cmCountersStream(df: DataFrame, valueCol: String,
      w: Int, d: Int): DataFrame =
    graft.operators.Sketches.cmCounters(df, valueCol, w, d)

  /** STREAMING Bloom build: the position SET streams as a distinct-
    * shaped aggregation (Update-mode counts per position — the table's
    * KEY SET is the filter; counts are irrelevant). The membership
    * structure of a runtime filter built from a stream of seen keys
    * equals the batch build exactly, because position-set union
    * commutes. State = one counter per touched position, bounded by m.
    * Positions come from the batch kernel ([[graft.operators.Bloom
    * .positionsCol]]) — one kernel, no stream/batch drift. */
  def bloomPositionsStream(df: DataFrame, keyCol: String,
      m: Int, k: Int): DataFrame = {
    graft.operators.Bloom.checkParams(m, k)
    df.filter(col(keyCol).isNotNull)
      .select(explode(
        graft.operators.Bloom.positionsCol(df, keyCol, m, k)).as("pos"))
      .groupBy(col("pos"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** EVENT-TIME WINDOWED sketches, APPEND mode — the final-only
    * emission family next to the running-estimate Update-mode streams
    * above (kmvDistinctStream/hllDistinctStream/cmCountersStream): a
    * consumer that wants one immutable sketch per closed time window
    * (the reference's `.finished`-marker incremental pattern mapped
    * onto event time) groups by `window(ts, ...)` under a watermark and
    * lets Append emit each window exactly once, when the watermark
    * passes its end. Late rows within the delay land in their correct
    * window regardless of arrival batch; rows later than the watermark
    * are dropped (spec-proven, the standard trade for bounded state).
    *
    * All three forms are ONE stateful aggregation whose per-window
    * state is the sketch itself (k longs / 64 registers / ≤ d·w cells)
    * — and because every sketch's merge commutes, the emitted window
    * equals the batch sketch over exactly the watermark-admitted rows,
    * which is what the q133/q134/q135 oracles replay. */
  def kmvWindowed(df: DataFrame, groupCol: String, valueCol: String,
      k: Int = 64, windowDuration: String = "1 day",
      watermarkDelay: String = "1 hour"): DataFrame = {
    require(k >= 2, "KMV needs k >= 2")
    // no distinct() stage: the bottom-k insert kernel dedupes hashes
    // itself (the Update-mode stream relies on the same property), so
    // the whole query is ONE stateful operator
    val flipped = graft.operators.Sketches.hashInput(df, valueCol)
      .bitwiseXOR(lit(Long.MinValue))
    df.filter(col(valueCol).isNotNull)
      .withWatermark("ts", watermarkDelay)
      .select(col("ts"), col(groupCol), flipped.as("_h"))
      .groupBy(window(col("ts"), windowDuration).as("_w"), col(groupCol))
      .agg(graft.plans.BottomKAggregator.bottom_k(k)(col("_h")).as("_ks"))
      .select(col("_w.start").as("window_start"), col(groupCol),
        graft.operators.Sketches.kmvEstimateColumn(col("_ks"), k)
          .as("kmv_estimate"))
  }

  /** Windowed HLL registers (Append): one row per (window, group,
    * register) once the window closes. The estimator is deliberately
    * NOT in-stream: callers fold the emitted registers through
    * [[graft.operators.Sketches.hllEstimateOver]] (the batch kernel) —
    * chaining a second aggregation onto a streaming agg is exactly the
    * multi-stateful-operator shape to avoid. */
  def hllRegsWindowed(df: DataFrame, groupCol: String, valueCol: String,
      windowDuration: String = "1 day",
      watermarkDelay: String = "1 hour"): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .withWatermark("ts", watermarkDelay)
      .select(col("ts"), col(groupCol),
        graft.operators.Sketches.hllRegUdf(
          graft.operators.Sketches.hashInput(df, valueCol)).as("_im"))
      .select(col("ts"), col(groupCol), expr("_im DIV 256").as("_idx"),
        expr("_im % 256").as("_m"))
      .groupBy(window(col("ts"), windowDuration).as("_w"), col(groupCol),
        col("_idx"))
      .agg(max(col("_m")).as("_reg"))
      .select(col("_w.start").as("window_start"), col(groupCol),
        col("_idx"), col("_reg"))

  /** Windowed Count–Min cells (Append): final (window, r, pos, cnt)
    * rows per closed window. Counters merge by ADDITION, so summing the
    * emitted windows' cells reconstructs the sketch over any window
    * union exactly — the q135 gate merges all closed windows and lands
    * on the batch chain over the admitted rows. */
  def cmCountersWindowed(df: DataFrame, valueCol: String, w: Int, d: Int,
      windowDuration: String = "1 day",
      watermarkDelay: String = "1 hour"): DataFrame = {
    graft.operators.Bloom.checkParams(w, d, who = "EventStream.cmCountersWindowed",
      mName = "w", kName = "d")
    df.filter(col(valueCol).isNotNull)
      .withWatermark("ts", watermarkDelay)
      .select(col("ts"), posexplode(
        graft.operators.Bloom.positionsCol(df, valueCol, w, d,
          who = "EventStream.cmCountersWindowed")))
      .select(col("ts"), col("pos").as("r"), col("col").as("pos"))
      .groupBy(window(col("ts"), windowDuration).as("_w"), col("r"), col("pos"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("_w.start").as("window_start"), col("r"), col("pos"),
        col("cnt"))
  }

  /** Windowed Bloom positions (Append): final (window, pos, cnt) rows
    * per closed window — the event-time form of [[bloomPositionsStream]]
    * (q129's Update-mode build). Each window's key SET is its filter;
    * position-set union across windows is the filter over the unioned
    * keys exactly (the q136 gate merges all closed windows and lands on
    * the batch verdicts over the admitted rows). Per-window state ≤ m
    * cells, evicted at window close. */
  def bloomPositionsWindowed(df: DataFrame, keyCol: String, m: Int, k: Int,
      windowDuration: String = "1 day",
      watermarkDelay: String = "1 hour"): DataFrame = {
    graft.operators.Bloom.checkParams(m, k)
    df.filter(col(keyCol).isNotNull)
      .withWatermark("ts", watermarkDelay)
      .select(col("ts"), explode(
        graft.operators.Bloom.positionsCol(df, keyCol, m, k)).as("pos"))
      .groupBy(window(col("ts"), windowDuration).as("_w"), col("pos"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("_w.start").as("window_start"), col("pos"), col("cnt"))
  }

  /** Stream-stream interval join: purchases joined to the clicks that
    * preceded them by ≤ `windowMinutes` for the same user. Both sides are
    * watermarked so the join state is bounded: a buffered click can be
    * dropped once the purchase-side watermark passes click.ts + window
    * (Spark derives the state horizon from the interval condition).
    * Works on batch frames too (same function, batch parity testable). */
  def purchaseAttribution(clicks: DataFrame, purchases: DataFrame,
      windowMinutes: Int = 30): DataFrame = {
    val c = clicks.select(col("user_id").as("click_user"),
        col("ts").as("click_ts"), col("event_id").as("click_id"))
      .withWatermark("click_ts", "1 hour")
    val p = purchases.select(col("user_id"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("purchase_ts", "1 hour")
    p.join(c,
      col("click_user") === col("user_id") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $windowMinutes MINUTES"))
      .drop("click_user")
  }

  /** Runs a streaming query over a parquet directory to completion using
    * the memory sink (the local harness for streaming parity tests).
    * @param shufflePartitions override for the STATE partition count —
    *   a streaming query pins its state layout to the session's
    *   shuffle-partition setting at start, and stateful operators pay
    *   per-store fixed costs (a stream-stream join opens FOUR stores per
    *   partition); small-state queries want few partitions regardless of
    *   the session's batch setting. Restored after start (the query
    *   keeps the value it started with).
    * @return the collected result table */
  def runToCompletion(spark: SparkSession, dir: String,
      transform: DataFrame => DataFrame, mode: OutputMode,
      queryName: String, shufflePartitions: Option[Int] = None): DataFrame = {
    val batchSchema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(batchSchema).parquet(dir)
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    shufflePartitions.foreach(n => spark.conf.set("spark.sql.shuffle.partitions", n))
    val q =
      try transform(stream).writeStream
        .outputMode(mode)
        .format("memory")
        .queryName(queryName)
        .start()
      finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    try q.processAllAvailable()
    finally q.stop()
    // Detach the result from the memory sink (r20 §5 leak fix): the sink
    // pins every emitted row on the driver through the registered temp
    // view FOREVER — a 341-query bench/verify session accumulates one
    // such table per streaming query and degrades into GC thrash
    // (measured: late-registry queries read 2–4× their anchors at the
    // default heap; dropping the view after an eager localCheckpoint
    // returns them to par). localCheckpoint materializes the (small,
    // aggregated) result once; its blocks are reclaimed by the
    // ContextCleaner when the returned frame goes unreferenced, unlike
    // the catalog-pinned sink table.
    val out = spark.table(queryName).localCheckpoint(true)
    spark.catalog.dropTempView(queryName)
    out
  }
}
