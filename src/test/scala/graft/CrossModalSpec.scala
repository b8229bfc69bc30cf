package graft

import org.apache.spark.sql.functions._

import graft.operators.CrossModal

/** Cross-modal pair construction: keep rule, batching determinism, and
  * the near-dup-negative exclusion, on hand-built fingerprints where
  * every Hamming distance is chosen. */
class CrossModalSpec extends SparkSuite {
  import spark.implicits._

  test("pairManifest: near-dup pairs drop to keep-lowest-id, negatives exclude near-dups") {
    // fps: 1 and 2 are near-dups (Hamming 1); 3 is Hamming 2 from 1;
    // 10 and 20 are far from everything and each other
    val docs = Seq(
      (1L, "caption one"), (2L, "caption two"), (3L, "caption three"),
      (10L, "ten"), (20L, "twenty")).toDF("doc_id", "text")
    val fps = Seq(
      (1L, 0xF0F0L), (2L, 0xF0F1L), (3L, 0xF0F3L),
      (10L, 0x0F0F000000L), (20L, 0xAA55AA55AA55L)).toDF("doc_id", "fp")
    val out = CrossModal.pairManifest(docs, fps, nBatches = 1, maxHamming = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
      .toMap
    assert(out.size == 5)
    // 1 < 2 < 3 all mutually within Hamming 3: only 1 survives
    assert(out(1L)._1 == 1L && out(2L)._1 == 0L && out(3L)._1 == 0L)
    assert(out(10L)._1 == 1L && out(20L)._1 == 1L)
    // dropped pairs carry sentinels
    assert(out(2L) == ((0L, 0L, 0L, -1L, -1L)))
    // kept pair 1's negatives: 10 and 20 (2 and 3 are dropped; none of
    // the kept others are within Hamming 3 of fp(1))
    assert(out(1L) == ((1L, 2L, 30L, 10L, 20L)))
    assert(out(10L) == ((1L, 2L, 21L, 1L, 20L)))
    assert(out(20L) == ((1L, 2L, 11L, 1L, 10L)))

    // near-dup NEGATIVE exclusion: two kept pairs within Hamming 3 of
    // each other cannot appear — but Hamming ≤ 3 kept pairs don't
    // coexist (the dedup dropped one). Exclusion bites when a kept
    // image is within the radius of a DIFFERENT pair's image while not
    // being its dedup victim — impossible at maxHamming used for both;
    // prove the code path with a LARGER dedup radius on the negative
    // side by direct construction: radius-0 dedup, radius-3 negatives.
    val fps2 = Seq((1L, 0L), (2L, 1L), (30L, 0xFF00FF00L))
      .toDF("doc_id", "fp")
    val docs2 = Seq((1L, "a"), (2L, "b"), (30L, "c")).toDF("doc_id", "text")
    val out2 = CrossModal.pairManifest(docs2, fps2, nBatches = 1, maxHamming = 0)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(4))).toMap
    // nothing deduped (no exact dups), but 1 and 2 are Hamming 1 apart:
    // with maxHamming = 0 they ARE each other's negatives
    assert(out2(1L) == ((1L, 2L)) && out2(2L) == ((1L, 2L)))

    // determinism: same input → same manifest
    val again = CrossModal.pairManifest(docs, fps, nBatches = 1, maxHamming = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
      .toMap
    assert(again == out)
  }

  test("pairManifest: mix64 batching bounds the negative scope") {
    val docs = (0L until 64L).map(i => (i, s"cap$i")).toDF("doc_id", "text")
    // mix64-spread fingerprints: pairwise Hamming ~32, none within 3
    // (an arithmetic family like i*0x1111111111 WAS measurably full of
    // Hamming-2 pairs — found the hard way)
    val fps = (0L until 64L)
      .map(i => (i, graft.functions.TextFunctions.mix64(i + 1000)))
      .toDF("doc_id", "fp")
    val out = CrossModal.pairManifest(docs, fps, nBatches = 8, maxHamming = 3)
      .collect()
    assert(out.forall(_.getLong(2) == 1L), "spread fps: nothing dedups")
    val byBatch = out.groupBy(_.getLong(3))
    byBatch.foreach { case (_, rows) =>
      val kept = rows.count(_.getLong(2) == 1L)
      rows.filter(_.getLong(2) == 1L).foreach { r =>
        assert(r.getLong(4) == kept - 1,
          s"every kept pair's negatives are exactly its kept batch peers: $r")
      }
    }
    // batch assignment is the documented function
    out.foreach { r =>
      val expect = java.lang.Long.remainderUnsigned(
        graft.functions.TextFunctions.mix64(r.getLong(0)), 8)
      assert(r.getLong(3) == expect)
    }
  }
}
