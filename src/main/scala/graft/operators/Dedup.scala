package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Deduplication operators over a (id, text) corpus — the standard
  * training-data pipeline ladder: exact → MinHash-LSH → SimHash →
  * exact-Jaccard verification.
  *
  * Scale shape (100 TB): every variant is
  *   narrow per-doc signature → shuffle on a SMALL key (hash / band
  *   bucket / simhash block) → pair join inside buckets only.
  * No all-pairs product ever materializes; bucket width bounds the
  * quadratic term. Signatures are a few hundred bytes/doc, so the
  * shuffled volume is ~signatures, not text.
  */
object Dedup {

  /** Exact dedup: content-hash groupBy, min(id) is the canonical keeper.
    * (dropDuplicates has the same plan; the explicit form also yields the
    * group sizes.) */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(sha2(col(textCol), 256).as("content_hash"), col(idCol))
      .groupBy(col("content_hash"))
      .agg(count(lit(1)).as("n_copies"), min(col(idCol)).as("keeper_id"))

  /** MinHash + LSH candidate pairs.
    *
    * shingle(n words) → minhash signature (numHashes) → split into
    * `bands` bands of numHashes/bands rows → explode one row per band →
    * shuffle on (band, hash(band-slice)) → pairs within buckets →
    * estimated Jaccard = fraction of matching signature positions.
    * Probability a pair with Jaccard j collides: 1-(1-j^r)^b — with
    * 128/32 bands it catches j ≳ 0.5.
    *
    * @return (idA, idB, est_jaccard) with idA < idB, distinct.
    */
  /** The per-doc signature stage shared by the pair and incremental
    * forms: fused tokenize→shingle→minhash kernel (one JVM pass per
    * doc). sig(0)=MaxValue ⇔ the doc had < shingleSize words: dropped
    * (two shingle-less docs would otherwise pair with est_jaccard 1). */
  private def signatures(df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int, numHashes: Int): DataFrame =
    df.select(col(idCol).as("id"),
        minhashText(col(textCol), shingleSize, numHashes).as("sig"))
      .filter(element_at(col("sig"), 1) =!= Long.MaxValue)

  /** Band stage over a signature frame: one (id, band, bucket) row per
    * band — the bucket join carries ONLY these ~28 bytes/row, never the
    * 1 KB signature. Bucket = xxhash64 of the band slice: the oracles
    * compare TRUE band keys, so bucket equality must coincide with key
    * equality in practice — 32-bit murmur actually collided at sf0.1
    * (≈0.2 expected cross-key collisions over 32 bands × 8k keys,
    * q152 hit one); at 64 bits the corpus-scale expectation is ~5e-11
    * and stays negligible far past 100 TB band-key cardinalities. */
  private def banded(sigs: DataFrame, numHashes: Int, bands: Int): DataFrame = {
    val rows = numHashes / bands
    sigs.select(col("id"),
        explode(sequence(lit(0), lit(bands - 1))).as("band"),
        col("sig"))
      .select(col("id"), col("band"), xxhash64(col("band"),
        slice(col("sig"), col("band") * rows + lit(1), lit(rows))).as("bucket"))
  }

  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, numHashes: Int = 128, bands: Int = 32): DataFrame = {
    require(numHashes % bands == 0)
    // the sig table is read 3× below (banding + 2 re-attach joins) →
    // persist, tracked so callers release it after their action
    // (OperatorCaches contract)
    val sigs = OperatorCaches.track(
      signatures(df, idCol, textCol, shingleSize, numHashes).persist())

    // At sf0.1 the 24-byte band rows are the difference between
    // shuffling ~8 MB and ~640 MB. Signatures re-attach after the
    // candidate pairs are deduped (two broadcast-able joins against the
    // compact sig table).
    val bandedAll = banded(sigs, numHashes, bands)

    val a = bandedAll.select(col("band"), col("bucket"), col("id").as("idA"))
    val b = bandedAll.select(col("band"), col("bucket"), col("id").as("idB"))
    val candidates = a.join(b, Seq("band", "bucket"))
      .filter(col("idA") < col("idB"))
      .select(col("idA"), col("idB"))
      .distinct() // a pair may collide in several bands

    candidates
      .join(sigs.select(col("id").as("idA"), col("sig").as("sigA")), Seq("idA"))
      .join(sigs.select(col("id").as("idB"), col("sig").as("sigB")), Seq("idB"))
      .withColumn("est_jaccard",
        round(size(filter(zip_with(col("sigA"), col("sigB"), (x, y) =>
          when(x === y, 1).otherwise(0)), v => v === 1)).cast("double")
          / numHashes, 6))
      .select(col("idA"), col("idB"), col("est_jaccard"))
  }

  /** SKETCH-QUALITY AUDIT — the measurement a pipeline owner runs before
    * trusting MinHash dedup verdicts at scale: for every LSH candidate
    * pair, the signature-estimated Jaccard (n_match/numHashes) NEXT TO
    * the exact shingle Jaccard, as integers (n_match, n_inter, n_union)
    * plus the two 6-dp ratios. The per-pair error distribution tells you
    * whether the 128-hash estimate separates your dedup threshold (est
    * std ≈ √(j(1−j)/128) ≈ 0.035 at j = 0.8) — if thresholding est
    * instead of exact Jaccard would flip verdicts, you need more hashes
    * or a verification stage.
    *
    * Scale shape: identical to [[minhashLshPairs]] (24-byte band rows
    * shuffle, signatures re-attach to the deduped candidate list) plus
    * the [[ngramJaccard]] shingle attach — all candidate-bounded; no
    * new all-pairs surface. */
  def minhashAccuracyAudit(df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, numHashes: Int = 128,
      bands: Int = 32): DataFrame = {
    require(numHashes % bands == 0)
    val sigs = OperatorCaches.track(
      signatures(df, idCol, textCol, shingleSize, numHashes).persist())
    val bandedAll = banded(sigs, numHashes, bands)
    val a = bandedAll.select(col("band"), col("bucket"), col("id").as("idA"))
    val b = bandedAll.select(col("band"), col("bucket"), col("id").as("idB"))
    val candidates = a.join(b, Seq("band", "bucket"))
      .filter(col("idA") < col("idB"))
      .select(col("idA"), col("idB")).distinct()
    val sh = OperatorCaches.track(df.select(col(idCol).as("id"),
      distinctShinglesCol(col(textCol), shingleSize).as("sh")).persist())
    candidates
      .join(sigs.select(col("id").as("idA"), col("sig").as("sigA")), Seq("idA"))
      .join(sigs.select(col("id").as("idB"), col("sig").as("sigB")), Seq("idB"))
      .join(sh.select(col("id").as("idA"), col("sh").as("shA")), Seq("idA"))
      .join(sh.select(col("id").as("idB"), col("sh").as("shB")), Seq("idB"))
      .select(col("idA"), col("idB"),
        size(filter(zip_with(col("sigA"), col("sigB"), (x, y) =>
          when(x === y, 1).otherwise(0)), v => v === 1))
          .cast("long").as("n_match"),
        size(array_intersect(col("shA"), col("shB"))).cast("long")
          .as("n_inter"),
        size(array_union(col("shA"), col("shB"))).cast("long").as("n_union"))
      .select(col("idA"), col("idB"), col("n_match"), col("n_inter"),
        col("n_union"),
        round(col("n_match").cast("double") / numHashes, 6)
          .as("est_jaccard"),
        round(col("n_inter").cast("double") / col("n_union"), 6)
          .as("jaccard"))
  }

  /** Incremental LSH dedup: count, per INCOMING document, the distinct
    * EXISTING documents sharing at least one band bucket — the daily-
    * ingest shape: the existing corpus's band table is computed once
    * per epoch (and in production saved bucketed on (band, bucket) via
    * Layout.bucketize, so a new batch joins it with ZERO corpus-side
    * work — no re-shingling, no re-hashing, no corpus shuffle).
    * n_matches = 0 ⇒ the incoming doc is NEW. Incoming docs too short
    * to shingle (< shingleSize words) have no signature and report 0 —
    * unmatchable, not known-new; route them to exact dedup.
    *
    * Returns one row per incoming id: (in_id, n_matches). */
  /** Public band-table stage: (id, band, bucket) rows for a corpus —
    * the saved/bucketized index side of incremental dedup, and the
    * per-batch side of its STREAMING form (works on a streaming frame:
    * the kernel is a per-row UDF + explode, no state). */
  def bandTable(df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, numHashes: Int = 128, bands: Int = 32): DataFrame = {
    require(numHashes % bands == 0)
    banded(signatures(df, idCol, textCol, shingleSize, numHashes),
      numHashes, bands)
  }

  def incrementalLshMatches(existing: DataFrame, incoming: DataFrame,
      idCol: String, textCol: String, shingleSize: Int = 3,
      numHashes: Int = 128, bands: Int = 32): DataFrame = {
    val bandsE = bandTable(existing, idCol, textCol, shingleSize, numHashes, bands)
      .select(col("band"), col("bucket"), col("id").as("ex_id"))
    val bandsI = bandTable(incoming, idCol, textCol, shingleSize, numHashes, bands)
      .select(col("band"), col("bucket"), col("id").as("in_id"))
    val matches = bandsI.join(bandsE, Seq("band", "bucket"))
      .groupBy(col("in_id"))
      .agg(countDistinct(col("ex_id")).as("n_matches"))
    incoming.select(col(idCol).as("in_id"))
      .join(matches, Seq("in_id"), "left")
      .select(col("in_id"),
        coalesce(col("n_matches"), lit(0L)).as("n_matches"))
  }

  /** Incremental LSH candidate PAIRS: every (existing-or-incoming,
    * incoming) pair sharing at least one band bucket — the edge form of
    * [[incrementalLshMatches]], feeding incremental GROUP maintenance
    * ([[DedupGroups.mergeBatch]]). Incoming-incoming pairs are included
    * (a batch can carry its own duplicates); existing-existing pairs are
    * NOT regenerated — the registry already closed them.
    *
    * 100 TB shape: the existing band table is the once-per-epoch index
    * (bucketized on (band, bucket) in production); the incoming side is
    * one day's batch. The join touches only buckets the batch hits. */
  def incrementalLshPairs(existing: DataFrame, incoming: DataFrame,
      idCol: String, textCol: String, shingleSize: Int = 3,
      numHashes: Int = 128, bands: Int = 32): DataFrame =
    incrementalLshPairsFromIndex(
      bandTable(existing, idCol, textCol, shingleSize, numHashes, bands),
      incoming, idCol, textCol, shingleSize, numHashes, bands)

  /** The production form of [[incrementalLshPairs]]: the existing side
    * is the SAVED per-epoch band index (id, band, bucket) — written once
    * by [[bandTable]] (bucketize on (band, bucket) at scale), so a daily
    * batch never re-shingles or re-hashes the corpus. */
  def incrementalLshPairsFromIndex(existingBands: DataFrame,
      incoming: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, numHashes: Int = 128,
      bands: Int = 32): DataFrame = {
    val bandsI = bandTable(incoming, idCol, textCol, shingleSize, numHashes, bands)
    val all = existingBands.select(col("id"), col("band"), col("bucket"))
      .unionByName(bandsI)
      .select(col("band"), col("bucket"), col("id").as("other"))
    bandsI.join(all, Seq("band", "bucket"))
      .filter(col("id") =!= col("other"))
      .select(least(col("id"), col("other")).as("idA"),
        greatest(col("id"), col("other")).as("idB"))
      .distinct()
  }

  /** [[incrementalLshMatches]] with a HOT-BUCKET CAP — the guard that
    * keeps LSH dedup sub-quadratic on adversarial data: a degenerate
    * band bucket (boilerplate shingles, a crawler fetching one page a
    * million times) holds B members and contributes B² candidate pairs;
    * at 100 TB one such bucket is the whole job's cost. Buckets whose
    * TOTAL membership (index ∪ batch) exceeds `maxBucket` are skipped
    * entirely — the standard trade: a doc whose every bucket is hot
    * reports fewer (possibly zero) matches through LSH and must be
    * routed to exact dedup (its content hash still catches identical
    * copies). The bucket histogram is one map-side-combining aggregate
    * on the ~24-byte band rows — exactly what a production job computes
    * anyway to monitor bucket skew.
    *
    * Returns (in_id, n_matches) — q152's shape under the cap. */
  def incrementalLshMatchesCapped(existing: DataFrame, incoming: DataFrame,
      idCol: String, textCol: String, maxBucket: Int,
      shingleSize: Int = 3, numHashes: Int = 128,
      bands: Int = 32): DataFrame = {
    require(maxBucket >= 2, s"a bucket needs 2 members to pair: $maxBucket")
    val bandsE = bandTable(existing, idCol, textCol, shingleSize, numHashes, bands)
      .select(col("band"), col("bucket"), col("id").as("ex_id"))
    val bandsI = bandTable(incoming, idCol, textCol, shingleSize, numHashes, bands)
      .select(col("band"), col("bucket"), col("id").as("in_id"))
    val cold = bandsE.select(col("band"), col("bucket"))
      .unionByName(bandsI.select(col("band"), col("bucket")))
      .groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("_n"))
      .filter(col("_n") <= maxBucket)
      .select(col("band"), col("bucket"))
    val matches = bandsI.join(cold, Seq("band", "bucket"), "left_semi")
      .join(bandsE.join(cold, Seq("band", "bucket"), "left_semi"),
        Seq("band", "bucket"))
      .groupBy(col("in_id"))
      .agg(countDistinct(col("ex_id")).as("n_matches"))
    incoming.select(col(idCol).as("in_id"))
      .join(matches, Seq("in_id"), "left")
      .select(col("in_id"),
        coalesce(col("n_matches"), lit(0L)).as("n_matches"))
  }

  /** Substring-level duplication profile (the Lee et al. 2022 exact-
    * substring dedup, in the alignment-free windowed form of
    * [[graft.functions.TextFunctions.anchoredWindowHashes]]): per doc,
    * how many of its content-anchored windows also occur in ANOTHER
    * doc. Downstream policy chooses what to do (drop the doc, cut the
    * span, keep one copy) — this operator owns the detection.
    *
    * Scale shape: narrow per-doc kernel → shuffle of (id, hash64) rows
    * only → one countDistinct per hash + one semi-join. No text ever
    * shuffles; the quadratic term is bounded per duplicated hash, and a
    * pathological boilerplate hash (every doc shares a header) is a
    * skew key to salt or cap exactly like the LSH hot buckets (q169).
    *
    * @return per corpus doc: (id, n_windows, n_dup_windows, dup_frac) */
  def duplicatedSubstrings(corpus: DataFrame, idCol: String,
      textCol: String, window: Int = 64, gate: Int = 4,
      modulo: Int = 16): DataFrame = {
    import graft.functions.TextFunctions
    val wins = OperatorCaches.track(corpus.select(col(idCol).as("id"),
      explode(TextFunctions.anchoredWindowHashesCol(col(textCol),
        window, gate, modulo)).as("h")).persist())
    val dupH = wins.groupBy(col("h"))
      .agg(countDistinct(col("id")).as("nd"))
      .filter(col("nd") >= 2).select(col("h"))
    val nWin = wins.groupBy(col("id")).agg(count(lit(1)).as("n_windows"))
    val nDup = wins.join(dupH, Seq("h"), "left_semi")
      .groupBy(col("id")).agg(count(lit(1)).as("n_dup_windows"))
    corpus.select(col(idCol).as("id"))
      .join(nWin, Seq("id"), "left")
      .join(nDup, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"))
      .withColumn("dup_frac", when(col("n_windows") === 0, lit(0.0))
        .otherwise(round(col("n_dup_windows").cast("double")
          / col("n_windows"), 6)))
  }

  /** Substring span REMOVAL — the second half of Lee et al. 2022's
    * exact-substring dedup ([[duplicatedSubstrings]] is the detection
    * half): excise every corpus-duplicated substring from every doc and
    * emit the cleaned text. Per doc, anchored windows whose hash occurs
    * in ≥2 distinct docs become char spans [pos, pos+window); touching
    * or overlapping spans merge (gaps-and-islands over a running-max
    * window function); the cleaned text is the concatenation of the
    * complement segments, built by one codegen'd `aggregate` fold over
    * the per-doc merged-span array — no UDF on the rewrite path.
    *
    * Scale shape: identical to [[duplicatedSubstrings]] until the spans
    * exist — narrow (id, pos, hash) rows shuffle, never text — then ONE
    * window + ONE groupBy both partitioned by doc id (span counts per
    * doc are bounded by len/modulo), and text is touched exactly once
    * in the final map-side fold. Removing from every copy is the
    * deterministic policy; "keep one occurrence" is this plus exempting
    * min(id) per duplicated hash from the span table.
    *
    * @return (id, n_spans, removed_chars, clean_len, clean_text) */
  def removeDuplicatedSpans(corpus: DataFrame, idCol: String,
      textCol: String, window: Int = 64, gate: Int = 4,
      modulo: Int = 16): DataFrame = {
    val wins = spanWindows(corpus, idCol, textCol, window, gate, modulo)
    val dupH = wins.groupBy(col("h"))
      .agg(countDistinct(col("id")).as("nd"))
      .filter(col("nd") >= 2).select(col("h"))
    val dupWins = wins.join(dupH, Seq("h"), "left_semi")
      .select(col("id"), col("pos"))
    cutSpans(corpus, idCol, textCol, dupWins, window)
  }

  /** [[removeDuplicatedSpans]] under the KEEP-ONE policy (Lee et al.
    * 2022's production form): the lowest-id document carrying a
    * duplicated window keeps it; every other occurrence is excised.
    * The keeper is chosen PER WINDOW HASH (a doc can keep one span and
    * lose another), so exactly one copy of every duplicated substring
    * survives in the corpus. Cross-doc duplication only: a hash
    * repeated within the keeper doc alone keeps all its copies (the
    * dup definition is countDistinct(doc) ≥ 2, same as detection).
    * Same shuffle shape as the remove-all form plus one min(id)
    * carried on the existing hash aggregation. */
  def removeDuplicatedSpansKeepOne(corpus: DataFrame, idCol: String,
      textCol: String, window: Int = 64, gate: Int = 4,
      modulo: Int = 16): DataFrame = {
    val wins = spanWindows(corpus, idCol, textCol, window, gate, modulo)
    val keepers = wins.groupBy(col("h"))
      .agg(countDistinct(col("id")).as("nd"), min(col("id")).as("keeper"))
      .filter(col("nd") >= 2).select(col("h"), col("keeper"))
    val dupWins = wins.join(keepers, Seq("h"))
      .filter(col("id") =!= col("keeper"))
      .select(col("id"), col("pos"))
    cutSpans(corpus, idCol, textCol, dupWins, window)
  }

  /** SURGICAL DECONTAMINATION — the removal half of the q198 report
    * (the Llama-style cleanup: when benchmark text leaks into training
    * documents, excise the LEAKED SPANS and keep the document, instead
    * of dropping every contaminated doc wholesale): every training-doc
    * anchored window whose hash appears in the EVAL set's window index
    * is cut, overlapping/touching windows merged to islands first
    * (the [[removeDuplicatedSpans]] machinery with the dup-window set
    * swapped for the eval-index probe).
    *
    * Scale shape: the eval index is DISTINCT window hashes of the
    * benchmark suite — tiny by definition — so the probe is a
    * broadcast join against the corpus's (id, pos, h) windows; the
    * island merge is a per-doc window over each doc's few hits, and
    * documents without hits never enter it (left join at the end).
    *
    * @return (id, n_spans, removed_chars, clean_len, clean_text) per
    *         corpus doc */
  def exciseContaminatedSpans(corpus: DataFrame, evalSet: DataFrame,
      idCol: String, textCol: String, window: Int = 64, gate: Int = 4,
      modulo: Int = 16): DataFrame = {
    val evalIdx = spanWindows(evalSet, idCol, textCol, window, gate, modulo)
      .select(col("h")).distinct()
    val hits = spanWindows(corpus, idCol, textCol, window, gate, modulo)
      .join(broadcast(evalIdx), Seq("h"))
      .select(col("id"), col("pos"))
    cutSpans(corpus, idCol, textCol, hits, window)
  }

  /** CORPUS DIAGNOSTICS — the "what boilerplate dominates my corpus"
    * report a curation run starts from: the top-k most-duplicated
    * anchored 64-char windows, with occurrence count, distinct-doc
    * count, and a readable example (the lexicographically first
    * (id, pos) occurrence's text). This is the reconnaissance view over
    * the same window index the span-removal operators consume —
    * scanning it tells you whether to reach for line dedup (q206),
    * span excision (q175), or nothing.
    *
    * Scale shape: one groupBy(h) with map-side combine plus an
    * h-partitioned row_number window — same key, so the exchange is
    * reused; the example text attaches by one id-keyed join against the
    * frame already collapsed to distinct duplicated hashes, and the
    * final top-k is a TakeOrdered bounded heap. Output order
    * (n_total DESC, example_id, example_pos) is total.
    *
    * @return top-k rows (n_total, n_docs, example_id, example_pos
    *         1-based, window_text) */
  def topDuplicatedWindows(corpus: DataFrame, idCol: String,
      textCol: String, k: Int = 20, window: Int = 64, gate: Int = 4,
      modulo: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wins = spanWindows(corpus, idCol, textCol, window, gate, modulo)
    val stats = wins.groupBy(col("h"))
      .agg(count(lit(1)).as("n_total"),
        countDistinct(col("id")).as("n_docs"))
      .filter(col("n_total") >= 2)
    val firstOcc = wins.withColumn("rn", row_number().over(
        Window.partitionBy(col("h")).orderBy(col("id"), col("pos"))))
      .filter(col("rn") === 1)
      .select(col("h"), col("id").as("example_id"),
        (col("pos") + 1).cast("long").as("example_pos"))
    stats.join(firstOcc, Seq("h"))
      .join(corpus.select(col(idCol).as("example_id"),
        col(textCol).as("_t")), Seq("example_id"))
      .select(col("n_total"), col("n_docs"), col("example_id"),
        col("example_pos"),
        expr(s"substring(_t, example_pos, $window)").as("window_text"))
      .orderBy(col("n_total").desc, col("example_id"), col("example_pos"))
      .limit(k)
  }

  /** Shared first stage of the span-removal forms: per-doc anchored
    * (pos, hash) windows, persisted for the two aggregations over it. */
  private def spanWindows(corpus: DataFrame, idCol: String,
      textCol: String, window: Int, gate: Int, modulo: Int): DataFrame = {
    import graft.functions.TextFunctions
    OperatorCaches.track(corpus.select(col(idCol).as("id"),
      explode(TextFunctions.anchoredWindowSpansCol(col(textCol),
        window, gate, modulo)).as("w"))
      .select(col("id"), col("w.pos").as("pos"), col("w.h").as("h"))
      .persist())
  }

  /** Shared second stage: merge the given per-doc span starts into
    * islands and cut the text (scaladoc on [[removeDuplicatedSpans]]).
    * Package-visible: [[Curation.stripBoilerplate]] cuts its mined
    * winnowing spans through the same machinery. */
  private[operators] def cutSpans(corpus: DataFrame, idCol: String,
      textCol: String, dupWins: DataFrame, window: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wPrev = Window.partitionBy("id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy("id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, 0)
    val merged = dupWins
      .withColumn("prev_end", max(col("pos") + lit(window)).over(wPrev))
      // new island iff this span starts strictly after every prior span's
      // end (pos == prev_end means touching spans — merged, same cut)
      .withColumn("isl", sum(when(col("prev_end").isNull ||
        col("pos") > col("prev_end"), 1).otherwise(0)).over(wRun))
      .groupBy(col("id"), col("isl"))
      .agg(min(col("pos")).as("s"), (max(col("pos")) + lit(window)).as("e"))
    val perDoc = merged.groupBy(col("id"))
      .agg(sort_array(collect_list(struct(col("s"), col("e")))).as("spans"),
        count(lit(1)).as("n_spans"),
        sum(col("e") - col("s")).as("removed_chars"))
    val withText = corpus.select(col(idCol).as("id"), col(textCol).as("text"))
      .join(perDoc, Seq("id"), "left")
    val cut = aggregate(
      col("spans"),
      struct(lit("").as("acc"), lit(0).as("cur")),
      (a, sp) => struct(
        concat(a.getField("acc"), col("text").substr(
          a.getField("cur") + lit(1),
          sp.getField("s") - a.getField("cur"))).as("acc"),
        sp.getField("e").as("cur")),
      a => concat(a.getField("acc"), col("text").substr(
        a.getField("cur") + lit(1),
        length(col("text")) - a.getField("cur"))))
    withText.select(col("id"),
      coalesce(col("n_spans"), lit(0L)).as("n_spans"),
      coalesce(col("removed_chars"), lit(0L)).cast("long").as("removed_chars"),
      when(col("spans").isNull, col("text")).otherwise(cut).as("clean_text"))
      .select(col("id"), col("n_spans"), col("removed_chars"),
        coalesce(length(col("clean_text")), lit(0)).cast("long").as("clean_len"),
        col("clean_text"))
  }

  /** The once-per-epoch substring index: DISTINCT anchored-window
    * hashes of the corpus — 8 bytes per distinct window, the saved side
    * a daily batch probes (the band-index discipline at substring
    * granularity). */
  def substringIndex(corpus: DataFrame, idCol: String, textCol: String,
      window: Int = 64, gate: Int = 4, modulo: Int = 16): DataFrame =
    corpus.select(explode(graft.functions.TextFunctions
      .anchoredWindowHashesCol(col(textCol), window, gate, modulo)).as("h"))
      .distinct()

  /** Incremental [[duplicatedSubstrings]]: per INCOMING doc, how many of
    * its anchored windows already exist in the epoch's
    * [[substringIndex]] — "how much of this new document is copied from
    * the corpus", the crawl-ingest gatekeeper. The batch side is narrow
    * per-doc hashing + one semi-join against the index; the corpus is
    * never re-hashed. */
  def incrementalDuplicatedSubstrings(existingIndex: DataFrame,
      incoming: DataFrame, idCol: String, textCol: String,
      window: Int = 64, gate: Int = 4, modulo: Int = 16): DataFrame = {
    val winsI = OperatorCaches.track(incoming.select(
      col(idCol).as("in_id"),
      explode(graft.functions.TextFunctions.anchoredWindowHashesCol(
        col(textCol), window, gate, modulo)).as("h")).persist())
    val nWin = winsI.groupBy(col("in_id")).agg(count(lit(1)).as("n_windows"))
    val nDup = winsI.join(existingIndex.select(col("h")), Seq("h"), "left_semi")
      .groupBy(col("in_id")).agg(count(lit(1)).as("n_dup_windows"))
    incoming.select(col(idCol).as("in_id"))
      .join(nWin, Seq("in_id"), "left")
      .join(nDup, Seq("in_id"), "left")
      .select(col("in_id"),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"))
      .withColumn("dup_frac", when(col("n_windows") === 0, lit(0.0))
        .otherwise(round(col("n_dup_windows").cast("double")
          / col("n_windows"), 6)))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxHamming.
    *
    * Pigeonhole blocking: split the 64-bit fingerprint into
    * maxHamming+1 blocks — any pair within distance k agrees on ≥1 block,
    * so pairs only form inside (block, blockValue) buckets. Hamming via
    * bit_count(xor) — codegen'd, no UDF on the pair path. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val nBlocks = maxHamming + 1
    val blockBits = 64 / nBlocks
    // JVM shifts are mod 64: maxHamming=0 → blockBits=64 → (1L<<64)-1
    // would be 0, degenerating every bucket to 0 (all-pairs join)
    val mask = if (blockBits >= 64) -1L else (1L << blockBits) - 1
    val fps = df.select(col(idCol).as("id"),
      simhash(tokens(lower(col(textCol)))).as("fp"))
    val blockVals = array((0 until nBlocks).map(b =>
      shiftrightunsigned(col("fp"), b * blockBits).bitwiseAND(lit(mask))): _*)
    val blocked = fps.select(col("id"), col("fp"),
      posexplode(blockVals).as(Seq("block", "blockVal")))
    val a = blocked.select(col("block"), col("blockVal"),
      col("id").as("idA"), col("fp").as("fpA"))
    val b = blocked.select(col("block"), col("blockVal"),
      col("id").as("idB"), col("fp").as("fpB"))
    a.join(b, Seq("block", "blockVal"))
      .filter(col("idA") < col("idB"))
      .select(col("idA"), col("idB"),
        bit_count(col("fpA").bitwiseXOR(col("fpB"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** The full dedup ladder as one operator: exact-hash groups collapse
    * first, then MinHash-LSH candidates are verified with exact n-gram
    * Jaccard, and every doc whose verified near-duplicate has a smaller id
    * is dropped. Returns the surviving rows of `df`.
    *
    * Decision rule (greedy keep-smallest-id) is deterministic and local:
    * a doc is dropped iff it has a verified duplicate with a smaller id —
    * no iterative connected components needed, and at 100 TB the decision
    * is one anti-join against the (small) drop list. */
  def dedupeCorpus(df: DataFrame, idCol: String, textCol: String,
      jaccardThreshold: Double = 0.8, shingleSize: Int = 3): DataFrame = {
    val exactDrops = df
      .select(sha2(col(textCol), 256).as("h"), col(idCol).as("id"))
      .groupBy(col("h"))
      .agg(min(col("id")).as("keeper"), collect_list(col("id")).as("ids"))
      .select(explode(col("ids")).as("dropId"), col("keeper"))
      .filter(col("dropId") =!= col("keeper"))
      .select(col("dropId"))

    val nearDrops = ngramJaccard(
        minhashLshPairs(df, idCol, textCol, shingleSize),
        df, idCol, textCol, shingleSize)
      .filter(col("jaccard") >= jaccardThreshold)
      .select(greatest(col("idA"), col("idB")).as("dropId"))

    df.join(exactDrops.unionByName(nearDrops).distinct()
        .withColumnRenamed("dropId", idCol),
      Seq(idCol), "left_anti")
  }

  /** Exact n-gram Jaccard for a set of candidate pairs (the verification
    * stage after LSH): array_intersect/array_union on distinct shingles. */
  def ngramJaccard(pairs: DataFrame, corpus: DataFrame, idCol: String,
      textCol: String, shingleSize: Int = 3): DataFrame = {
    // fused shingle kernel; table read twice (idA/idB attach) → persist,
    // tracked for caller release (OperatorCaches)
    val sh = OperatorCaches.track(corpus.select(col(idCol).as("id"),
      distinctShinglesCol(col(textCol), shingleSize).as("sh")).persist())
    pairs
      .join(sh.select(col("id").as("idA"), col("sh").as("shA")), Seq("idA"))
      .join(sh.select(col("id").as("idB"), col("sh").as("shB")), Seq("idB"))
      .withColumn("jaccard",
        round(size(array_intersect(col("shA"), col("shB"))).cast("double")
          / size(array_union(col("shA"), col("shB"))), 6))
      .select(col("idA"), col("idB"), col("jaccard"))
  }
}
