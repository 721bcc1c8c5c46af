package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k aggregation by (score desc, id asc).
  *
  * The window-function top-k (`row_number().over(partitionBy(q).orderBy
  * (score))`) shuffles and SORTS every candidate row per group; this
  * aggregator keeps a k-bounded sorted buffer instead, so map-side partial
  * aggregation reduces each partition to ≤k rows per group before the
  * shuffle — at 10⁹ candidates per query that is the difference between
  * shuffling gigabytes and kilobytes. The total order (score desc, id asc)
  * makes the result deterministic under any partitioning/merge order.
  */
object TopKAggregate {

  case class Scored(id: Long, score: Double)

  class TopK(k: Int) extends Aggregator[Scored, List[Scored], Seq[Scored]] {

    private def lt(a: Scored, b: Scored): Boolean =
      a.score > b.score || (a.score == b.score && a.id < b.id)

    private def insert(buf: List[Scored], x: Scored): List[Scored] = {
      if (buf.lengthCompare(k) >= 0 && lt(buf.last, x)) buf
      else {
        val (better, worse) = buf.span(lt(_, x))
        (better ::: x :: worse).take(k)
      }
    }

    def zero: List[Scored] = Nil
    def reduce(buf: List[Scored], x: Scored): List[Scored] = insert(buf, x)
    def merge(a: List[Scored], b: List[Scored]): List[Scored] =
      b.foldLeft(a)(insert)
    def finish(buf: List[Scored]): Seq[Scored] = buf
    def bufferEncoder: Encoder[List[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Scored]]()
    def outputEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  }

  /** Column function: `topK(k)(idCol, scoreCol)` → `array<struct<id,score>>`
    * sorted by (score desc, id asc), length ≤ k. */
  def topK(k: Int): (Column, Column) => Column = {
    val fn = udaf(new TopK(k), Encoders.product[Scored])
    (id: Column, score: Column) => fn(id, score)
  }
}
