package graft

import org.apache.spark.sql.functions._

import graft.operators.Bloom

/** Bloom filter: no false negatives ever, deterministic false positives,
  * prune∘exact-join == exact-join, nulls, parameter validation. */
class BloomSpec extends SparkSuite {
  import spark.implicits._

  test("no false negatives: every built key passes") {
    val keys = (0L until 500L).map(_ * 7919L)
    val df = keys.toDF("key")
    val words = Bloom.build(df, "key", 1024, 3)
    val missed = df.filter(!Bloom.mightContain(words, 1024, 3)(col("key")))
    assert(missed.count() == 0)
  }

  test("false positives are deterministic (same filter, same verdicts)") {
    val build = (0L until 200L).map(_ * 13L + 5L).toDF("key")
    val probe = (0L until 2000L).toDF("key")
    def verdicts = {
      val words = Bloom.build(build, "key", 512, 2)
      probe.withColumn("p", Bloom.mightContain(words, 512, 2)(col("key")))
        .as[(Long, Boolean)].collect().toMap
    }
    val a = verdicts
    val b = verdicts
    assert(a == b)
    // a small m forces real false positives — the property being pinned
    val actual = build.as[Long].collect().toSet
    val fps = a.count { case (k, p) => p && !actual(k) }
    assert(fps > 0, "expected false positives at this load factor")
  }

  test("prune keeps a superset of matches; exact join after prune is exact") {
    val build = Seq(1L, 5L, 9L).toDF("key")
    val probe = (0L until 100L).toDF("key")
    val pruned = Bloom.prune(probe, "key", build, "key", m = 4096, k = 3)
    val exact = probe.join(build, Seq("key"), "left_semi")
      .as[Long].collect().sorted.toSeq
    val prunedThenJoin = pruned.join(build, Seq("key"), "left_semi")
      .as[Long].collect().sorted.toSeq
    assert(prunedThenJoin == exact)
    assert(pruned.count() >= exact.size)
  }

  test("null keys: skipped in build, null verdict on probe") {
    val build = Seq(Some(1L), None, Some(2L)).toDF("key")
    val words = Bloom.build(build, "key", 256, 2)
    val v = Seq(Some(1L), None).toDF("key")
      .select(Bloom.mightContain(words, 256, 2)(col("key")))
      .collect()
    assert(v(0).getBoolean(0))
    assert(v(1).isNullAt(0))
  }

  test("string keys route through the fnv fold: no false negatives, fractional rejected") {
    // strings go through Bloom.keyHash (fnv1a64 → position kernel); a
    // collision merges position sets, which only ADDS false positives —
    // built keys must still always pass
    val urls = (0 until 400).map(i => s"https://example.com/doc/$i").toDF("key")
    val words = Bloom.build(urls, "key", 2048, 3)
    val missed = urls.filter(
      !Bloom.mightContainIn(urls, "key", words, 2048, 3))
    assert(missed.count() == 0)
    val pruned = Bloom.prune(
      (0 until 1000).map(i => s"https://example.com/doc/$i").toDF("key"),
      "key", urls, "key", m = 2048, k = 3)
    assert(pruned.count() >= 400, "every true member must survive pruning")
    // fractional keys stay rejected — 1.5 and 1.9 would silently coerce
    val dbl = Seq(1.5).toDF("key")
    val e = intercept[IllegalArgumentException](Bloom.build(dbl, "key", 256, 2))
    assert(e.getMessage.contains("integral"))
    intercept[IllegalArgumentException](
      Bloom.prune(dbl, "key", Seq(1L).toDF("key"), "key"))
  }

  test("streaming bloom build == batch position set, across batch splits") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val keys = (0L until 500L).map(_ * 17L)
    val expected = keys.flatMap(k => Bloom.positions(k, 1024, 3)).toSet

    val ms = MemoryStream[Long](spark)
    val q = graft.streaming.EventStream
      .bloomPositionsStream(ms.toDF().toDF("key"), "key", 1024, 3)
      .writeStream.outputMode("update")
      .format("memory").queryName("bloom_stream").start()
    try {
      ms.addData(keys.take(200): _*); q.processAllAvailable()
      ms.addData(keys.drop(150): _*); q.processAllAvailable() // overlap
    } finally q.stop()
    val got = spark.table("bloom_stream")
      .select(col("pos")).distinct().as[Long].collect().toSet
    assert(got == expected, "streamed position set must equal the batch set")
  }

  test("parameter validation is loud") {
    val df = Seq(1L).toDF("key")
    intercept[IllegalArgumentException](Bloom.build(df, "key", 1000, 3)) // not 2^n
    intercept[IllegalArgumentException](Bloom.build(df, "key", 32, 3))   // < 64
    intercept[IllegalArgumentException](Bloom.build(df, "key", 256, 0))  // k < 1
    intercept[IllegalArgumentException](
      Bloom.mightContain(new Array[Long](2), 256, 2)(col("key")))        // words/m mismatch
  }
}
