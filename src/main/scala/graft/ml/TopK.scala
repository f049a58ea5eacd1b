package graft.ml

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k as a typed Aggregator (SURVEY.md §2.8 / §4 optimization 3):
  * the scale path for grouped top-k when the rank-window form would shuffle
  * every candidate row. The buffer holds ≤ k entries, so partial aggregation
  * bounds both memory and shuffle volume at k·|groups| regardless of
  * candidate count — the same algorithm as the reference's hand-maintained
  * k-best array (KNNMapper.java:147-159), but spillable and mergeable.
  *
  * Ordering: score descending, then id ascending — identical to the window
  * form's (sim desc, n_id asc), so both paths return the same rows.
  */
object TopK {

  case class Scored(id: Long, score: Double)

  private def better(a: Scored, b: Scored): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  /** Aggregator keeping the k best (score desc, id asc) entries per group. */
  def topK(k: Int): Aggregator[Scored, Seq[Scored], Seq[Scored]] =
    new Aggregator[Scored, Seq[Scored], Seq[Scored]] {
      override def zero: Seq[Scored] = Vector.empty

      override def reduce(buf: Seq[Scored], a: Scored): Seq[Scored] = insert(buf, a)

      override def merge(b1: Seq[Scored], b2: Seq[Scored]): Seq[Scored] =
        b2.foldLeft(b1)(insert)

      private def insert(buf: Seq[Scored], a: Scored): Seq[Scored] = {
        if (buf.size < k) (buf :+ a).sortWith(better)
        else if (better(a, buf.last)) (buf.init :+ a).sortWith(better)
        else buf
      }

      override def finish(buf: Seq[Scored]): Seq[Scored] = buf

      override def bufferEncoder: Encoder[Seq[Scored]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
      override def outputEncoder: Encoder[Seq[Scored]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
    }
}
