package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CROSS-MODAL (caption, image) training-pair construction — the step
  * between curated per-modality corpora and a CLIP-style contrastive
  * trainer's input file. The engine already curates text (q177/q185),
  * dedups every media class (q186–q203) and builds text shards (q187);
  * this operator composes the multimodal ending: doc-keyed pairing,
  * duplicate-aware pair filtering, and in-batch contrastive negatives.
  *
  * Design choices a production pair builder makes, encoded here:
  *  - PAIR-LEVEL dedup keys on the IMAGE near-dup relation (dHash
  *    Hamming ≤ 3), not exact bytes: a re-encoded or brightness-shifted
  *    copy of the same picture under a different caption still teaches
  *    the model the same positive — keep-lowest-id, drop the rest.
  *  - Negatives are IN-BATCH (the standard contrastive recipe): pairs
  *    shard into deterministic mix64 buckets and each pair's negatives
  *    are its bucket's other kept images — minus any image within the
  *    near-dup radius of its own positive (a near-dup negative is a
  *    FALSE negative; this is the anti-join the exclusion pattern
  *    exists for).
  *
  * Scale shape (100 TB): images ride as 8-byte fingerprints end to end
  * (bytes never shuffle); the dedup filter is the bucketed
  * [[ImageDedup.hammingPairs]] (never all-pairs); the only quadratic
  * term is within-batch negative pairing, bounded by the batch size —
  * nBatches is the parallelism/size knob, scaled with the corpus
  * exactly as a trainer's global batch count would be.
  */
object CrossModal {

  /** Pair manifest over captioned docs and their image fingerprints.
    *
    * @param docs     (doc_id, text) — the caption side
    * @param imageFps (doc_id, fp) — [[ImageDedup.fingerprints]] of the
    *                 doc-keyed image side
    * @return one row per pair: (doc_id, caption_len, kept 1|0, batch,
    *         n_negatives, neg_id_sum, neg_id_min, neg_id_max) — the
    *         negative-set evidence as exact aggregates; −1/0 sentinels
    *         on dropped pairs */
  def pairManifest(docs: DataFrame, imageFps: DataFrame,
      nBatches: Int = 16, maxHamming: Int = 3): DataFrame = {
    val pairs = docs.select(col("doc_id"),
        length(coalesce(col("text"), lit(""))).cast("long").as("caption_len"))
      .join(imageFps, Seq("doc_id"))
    val dropped = ImageDedup.hammingPairs(imageFps, maxHamming)
      .select(col("idB").as("doc_id")).distinct()
      .withColumn("_dropped", lit(true))
    val batchUdf = udf((id: Long) => java.lang.Long.remainderUnsigned(
      graft.functions.TextFunctions.mix64(id), nBatches))
    // read twice (kept side + final manifest) — persist via the caches
    // contract so benched queries release it
    val labeled = OperatorCaches.track(pairs
      .join(dropped, Seq("doc_id"), "left")
      .select(col("doc_id"), col("caption_len"), col("fp"),
        col("_dropped").isNull.as("kept"),
        batchUdf(col("doc_id")).as("batch")).persist())
    val keptP = labeled.filter(col("kept"))
      .select(col("batch"), col("doc_id"), col("fp"))
    val negs = keptP.join(
        keptP.select(col("batch"), col("doc_id").as("nid"),
          col("fp").as("nfp")),
        Seq("batch"))
      .filter(col("nid") =!= col("doc_id") &&
        bit_count(col("fp").bitwiseXOR(col("nfp"))) > maxHamming)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_negatives"),
        sum(col("nid")).as("neg_id_sum"),
        min(col("nid")).as("neg_id_min"),
        max(col("nid")).as("neg_id_max"))
    labeled.join(negs, Seq("doc_id"), "left")
      .select(col("doc_id"), col("caption_len"),
        when(col("kept"), 1L).otherwise(0L).as("kept"),
        col("batch").cast("long").as("batch"),
        coalesce(col("n_negatives"), lit(0L)).as("n_negatives"),
        coalesce(col("neg_id_sum"), lit(0L)).as("neg_id_sum"),
        coalesce(col("neg_id_min"), lit(-1L)).as("neg_id_min"),
        coalesce(col("neg_id_max"), lit(-1L)).as("neg_id_max"))
  }
}
