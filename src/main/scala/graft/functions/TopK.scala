package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Custom typed aggregate (SURVEY.md §2.10): per-group top-k by score,
  * as an `Aggregator[IN, BUF, OUT]` registered through `functions.udaf`.
  *
  * This is the bounded-state alternative to window row_number top-k: the
  * buffer holds at most k (score, id) pairs per group, so map-side
  * partial aggregation prunes before the shuffle — for per-bucket top-k
  * similarity at 100 TB the exchange carries k rows per (partition ×
  * bucket) instead of every candidate row.
  */
final case class ScoredId(score: Double, id: Long)

class TopKAggregator(k: Int)
    extends Aggregator[ScoredId, List[ScoredId], Seq[ScoredId]] {

  // explicit comparator mirroring TopKLongAggregator: Double.compare is
  // a total order (NaN sorts above +Inf, so a NaN score can never shadow
  // a real one silently — it ranks deterministically), whereas
  // sortBy(-score) flips -0.0/0.0 and leaves NaN placement to the
  // implicit tuple ordering
  private val ord: Ordering[ScoredId] = (a: ScoredId, b: ScoredId) => {
    val c = java.lang.Double.compare(b.score, a.score)
    if (c != 0) c else java.lang.Long.compare(a.id, b.id)
  }

  private def prune(xs: List[ScoredId]): List[ScoredId] =
    xs.sorted(ord).take(k)

  override def zero: List[ScoredId] = Nil
  override def reduce(buf: List[ScoredId], a: ScoredId): List[ScoredId] =
    prune(a :: buf)
  override def merge(b1: List[ScoredId], b2: List[ScoredId]): List[ScoredId] =
    prune(b1 ++ b2)
  override def finish(buf: List[ScoredId]): Seq[ScoredId] = prune(buf)
  override def bufferEncoder: Encoder[List[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

/** [[ScoredId]] with an EXACT int64 score — for rankings on fixed-point
  * dot products, where a Double score would collapse distinct int64
  * values above 2^53 (reachable at embedding dims ≳ 91) and could rank
  * differently from the oracle's BIGINT ORDER BY.
  */
final case class ScoredIdL(score: Long, id: Long)

class TopKLongAggregator(k: Int)
    extends Aggregator[ScoredIdL, List[ScoredIdL], Seq[ScoredIdL]] {

  // explicit comparator, NOT sortBy(-score): negating Long.MinValue
  // overflows to itself and would rank the worst score first
  private val ord: Ordering[ScoredIdL] = (a: ScoredIdL, b: ScoredIdL) => {
    val c = java.lang.Long.compare(b.score, a.score)
    if (c != 0) c else java.lang.Long.compare(a.id, b.id)
  }

  private def prune(xs: List[ScoredIdL]): List[ScoredIdL] =
    xs.sorted(ord).take(k)

  override def zero: List[ScoredIdL] = Nil
  override def reduce(buf: List[ScoredIdL], a: ScoredIdL): List[ScoredIdL] =
    prune(a :: buf)
  override def merge(b1: List[ScoredIdL],
      b2: List[ScoredIdL]): List[ScoredIdL] =
    prune(b1 ++ b2)
  override def finish(buf: List[ScoredIdL]): Seq[ScoredIdL] = prune(buf)
  override def bufferEncoder: Encoder[List[ScoredIdL]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[ScoredIdL]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

object TopK {
  /** top_k(score, id): Column aggregate usable in `.agg(...)`. */
  def topK(k: Int)(score: Column, id: Column): Column = {
    implicit val inEnc: Encoder[ScoredId] = Encoders.product[ScoredId]
    udaf(new TopKAggregator(k)).apply(score, id)
  }

  /** top_k over EXACT int64 scores (ties → smaller id) — bit-identical
    * to a `row_number() OVER (ORDER BY score DESC, id)` rank at any
    * score magnitude, with the UDAF's bounded-state map-side pruning.
    */
  def topKLong(k: Int)(score: Column, id: Column): Column = {
    implicit val inEnc: Encoder[ScoredIdL] = Encoders.product[ScoredIdL]
    udaf(new TopKLongAggregator(k)).apply(score, id)
  }
}
