package graft.plans

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k as a typed Aggregator.
  *
  * vs the window form (`row_number().over(partitionBy(g).orderBy(s))
  * .filter(rn <= k)`): the window must shuffle and SORT every row of every
  * group; this aggregator keeps a k-element buffer per group and combines
  * map-side, so the shuffle carries at most k rows per group per map task —
  * the difference between shuffling 100 TB and shuffling k×|groups| rows.
  *
  * Ordering: score DESC, id ASC (deterministic under score ties).
  * Output: the top-k (score, id) pairs, rank-ordered.
  */
object TopKAggregator {

  final case class ScoredId(score: Double, id: Long)

  private def insert(buf: List[ScoredId], v: ScoredId, k: Int): List[ScoredId] = {
    // descending by score, ascending id on ties; buffer stays sorted+bounded
    val (better, rest) = buf.span(b =>
      b.score > v.score || (b.score == v.score && b.id < v.id))
    (better ::: v :: rest).take(k)
  }

  class TopK(k: Int) extends Aggregator[ScoredId, List[ScoredId], Seq[ScoredId]] {
    override def zero: List[ScoredId] = Nil
    override def reduce(b: List[ScoredId], a: ScoredId): List[ScoredId] =
      insert(b, a, k)
    override def merge(b1: List[ScoredId], b2: List[ScoredId]): List[ScoredId] =
      b2.foldLeft(b1)((acc, v) => insert(acc, v, k))
    override def finish(r: List[ScoredId]): Seq[ScoredId] = r
    override def bufferEncoder: Encoder[List[ScoredId]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[ScoredId]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Untyped-DataFrame form: `df.groupBy(g).agg(top_k(3)(score, id))`
    * → ARRAY<STRUCT<score, id>> rank-ordered. */
  def top_k(k: Int)(score: Column, id: Column): Column = {
    implicit val enc: Encoder[ScoredId] = Encoders.product[ScoredId]
    udaf(new TopK(k)).apply(score, id)
  }
}

/** Bounded bottom-k over DISTINCT longs with EXACT long ordering — the
  * state carrier for KMV-style sketches ([[graft.operators.Sketches]]).
  * [[TopKAggregator]] ranks by a double score, which cannot order raw
  * 64-bit hashes (a double has 53 mantissa bits — close hashes collide);
  * this keeps the k smallest distinct Long values under signed compare.
  * Same shuffle shape: ≤ k longs per group per map task. */
object BottomKAggregator {

  /** Also the state-merge kernel for the STREAMING sketch
    * (EventStream.kmvDistinctStream) — one insert definition, so batch
    * aggregation and stream state can never diverge. */
  private[graft] def insert(buf: List[Long], v: Long, k: Int): List[Long] = {
    val (lt, rest) = buf.span(_ < v)
    if (rest.headOption.contains(v)) buf // distinct: drop re-occurrences
    else (lt ::: v :: rest).take(k)
  }

  class BottomK(k: Int) extends Aggregator[Long, List[Long], Seq[Long]] {
    override def zero: List[Long] = Nil
    override def reduce(b: List[Long], a: Long): List[Long] = insert(b, a, k)
    override def merge(b1: List[Long], b2: List[Long]): List[Long] =
      b2.foldLeft(b1)((acc, v) => insert(acc, v, k))
    override def finish(r: List[Long]): Seq[Long] = r
    override def bufferEncoder: Encoder[List[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** `df.groupBy(g).agg(bottom_k(64)(hash))` → ARRAY<BIGINT>, ascending. */
  def bottom_k(k: Int)(v: Column): Column =
    udaf(new BottomK(k)).apply(v)

  final case class HashedValue(h: Long, v: Double)

  /** The sample-insert kernel, shared with the STREAMING quantile state
    * (EventStream.sampleQuantilesStream) — one insert definition, so
    * batch aggregation and stream state can never diverge (the
    * [[insert]]/kmv discipline). */
  private[graft] def insertSample(buf: List[HashedValue], a: HashedValue,
      k: Int): List[HashedValue] = {
    val (lt, rest) = buf.span(_.h < a.h)
    if (rest.headOption.exists(_.h == a.h)) buf
    else (lt ::: a :: rest).take(k)
  }

  /** Bottom-k ROWS by hash, carrying a payload value — the deterministic
    * uniform-sample state for [[graft.operators.Sketches.sampleQuantiles]]:
    * keep the k rows whose (unique-id) hashes are smallest, return their
    * values. Distinct-by-hash (mix64 of a unique id never collides — it
    * is a bijection), so a retried row can't enter the sample twice. */
  class BottomKSample(k: Int)
    extends Aggregator[HashedValue, List[HashedValue], Seq[Double]] {
    private def insert(buf: List[HashedValue], a: HashedValue): List[HashedValue] =
      insertSample(buf, a, k)
    override def zero: List[HashedValue] = Nil
    override def reduce(b: List[HashedValue], a: HashedValue): List[HashedValue] =
      insert(b, a)
    override def merge(b1: List[HashedValue], b2: List[HashedValue]): List[HashedValue] =
      b2.foldLeft(b1)(insert)
    override def finish(r: List[HashedValue]): Seq[Double] = r.map(_.v)
    override def bufferEncoder: Encoder[List[HashedValue]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** `df.groupBy(g).agg(bottom_k_sample(256)(hash, value))` →
    * ARRAY<DOUBLE> of the k sampled values (hash order). */
  def bottom_k_sample(k: Int)(h: Column, v: Column): Column = {
    implicit val enc: Encoder[HashedValue] = Encoders.product[HashedValue]
    udaf(new BottomKSample(k)).apply(h, v)
  }

  final case class HashedId(h: Long, v: Long)

  /** [[BottomKSample]] with a LONG payload — for sampling doc IDS, which
    * must not round-trip through a double (53 mantissa bits silently
    * corrupt ids above 2^53; round-14 advice on QualityModel.sampleIds).
    * Same insert discipline: distinct-by-hash, bounded at k. */
  class BottomKSampleLong(k: Int)
    extends Aggregator[HashedId, List[HashedId], Seq[Long]] {
    private def insert(buf: List[HashedId], a: HashedId): List[HashedId] = {
      val (lt, rest) = buf.span(_.h < a.h)
      if (rest.headOption.exists(_.h == a.h)) buf
      else (lt ::: a :: rest).take(k)
    }
    override def zero: List[HashedId] = Nil
    override def reduce(b: List[HashedId], a: HashedId): List[HashedId] =
      insert(b, a)
    override def merge(b1: List[HashedId], b2: List[HashedId]): List[HashedId] =
      b2.foldLeft(b1)(insert)
    override def finish(r: List[HashedId]): Seq[Long] = r.map(_.v)
    override def bufferEncoder: Encoder[List[HashedId]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** `df.groupBy(g).agg(bottom_k_sample_long(256)(hash, id))` →
    * ARRAY<BIGINT> of the k sampled ids (hash order), bit-exact. */
  def bottom_k_sample_long(k: Int)(h: Column, v: Column): Column = {
    implicit val enc: Encoder[HashedId] = Encoders.product[HashedId]
    udaf(new BottomKSampleLong(k)).apply(h, v)
  }
}
