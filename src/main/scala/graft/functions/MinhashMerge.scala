package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` (the engine's UDAF surface, SURVEY §2.8) that
  * MERGES MinHash signatures by elementwise minimum — the algebraic
  * property that makes MinHash distribution-friendly: the signature of a
  * union of shingle sets is the elementwise min of the parts'
  * signatures. Use it to roll chunk-level signatures up to documents
  * (or documents up to sources) with an ordinary `groupBy().agg()`:
  * partial aggregation composes because min is associative and
  * commutative, so the merge is map-side combinable at any scale.
  */
object MinhashMerge extends Aggregator[Seq[String], Array[String], Seq[String]] {

  override def zero: Array[String] = Array.empty

  override def reduce(buf: Array[String], sig: Seq[String]): Array[String] =
    mergeArrays(buf, if (sig == null) Array.empty[String] else sig.toArray)

  override def merge(a: Array[String], b: Array[String]): Array[String] =
    mergeArrays(a, b)

  override def finish(buf: Array[String]): Seq[String] =
    if (buf.isEmpty) null else buf.toSeq

  private def mergeArrays(a: Array[String], b: Array[String]): Array[String] =
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      require(a.length == b.length,
        s"cannot merge MinHash signatures of widths ${a.length} and ${b.length}")
      val out = new Array[String](a.length)
      var i = 0
      while (i < a.length) {
        out(i) = if (a(i) <= b(i)) a(i) else b(i)
        i += 1
      }
      out
    }

  override def bufferEncoder: Encoder[Array[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()
  override def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}
