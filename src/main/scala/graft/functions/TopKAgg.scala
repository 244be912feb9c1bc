package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded-heap top-k aggregator (SURVEY.md §2.10 F2 — the declared
  * UDAF extension surface): keeps the k highest-scored (score, id)
  * pairs per group with an O(k) buffer.
  *
  * Why not `row_number().over(partitionBy)`: the window form shuffles
  * and SORTS every candidate row per key. This aggregator is a hash
  * aggregate — partial heaps of size k are built map-side, merged on
  * the reduce side, so the shuffle carries k rows per (partition, key)
  * instead of the full candidate set. At |corpus| x |queries| kNN scale
  * that is the difference between shuffling k·q rows and shuffling
  * every scored pair.
  *
  * Determinism: ties on score break toward the smaller id, matching the
  * `orderBy(sim desc, id)` convention of the window form.
  */
class TopKAgg(k: Int)
  extends Aggregator[(Double, Long), List[(Double, Long)], Seq[(Double, Long)]] {

  override def zero: List[(Double, Long)] = Nil

  private def insert(buf: List[(Double, Long)],
      x: (Double, Long)): List[(Double, Long)] = {
    // descending by score, ascending by id on ties
    val (better, worse) = buf.span(b =>
      b._1 > x._1 || (b._1 == x._1 && b._2 < x._2))
    val merged = better ::: (x :: worse)
    if (merged.length > k) merged.take(k) else merged
  }

  override def reduce(buf: List[(Double, Long)],
      x: (Double, Long)): List[(Double, Long)] = insert(buf, x)

  override def merge(a: List[(Double, Long)],
      b: List[(Double, Long)]): List[(Double, Long)] =
    b.foldLeft(a)(insert)

  override def finish(r: List[(Double, Long)]): Seq[(Double, Long)] = r

  override def bufferEncoder: Encoder[List[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

object TopKAgg {
  /** Column form: `topK(k, scoreCol, idCol)` yielding
    * array<struct<_1: score, _2: id>> ranked best-first. */
  def topK(k: Int, score: org.apache.spark.sql.Column,
      id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.udaf(new TopKAgg(k)).apply(score, id)
}
