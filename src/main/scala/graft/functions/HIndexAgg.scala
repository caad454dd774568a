package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** h-index as a true partial aggregate.
  *
  * The reference computes h-index by `collect_list`-ing every citation
  * count into one row and running a scalar UDF over the list
  * (`src/notebooks/scala/ProfileConversion.scala:122-125,148-152`). That
  * materializes an author's whole history in a single row — at 100 TB a
  * hyper-entity blows executor memory. This Aggregator keeps a clipped
  * value histogram instead: constant-size buffer, map-side partial
  * aggregation, exact for h ≤ CAP (an h-index above 4096 means the
  * entity has >4096 items each with value >4096 — clip is documented,
  * not a correctness risk at any realistic scale).
  */
object HIndexAgg extends Aggregator[Long, Array[Long], Int] {
  final val Cap = 4096

  override def zero: Array[Long] = Array.empty

  private def grow(b: Array[Long], upto: Int): Array[Long] =
    if (b.length > upto) b
    else { val n = new Array[Long](upto + 1); System.arraycopy(b, 0, n, 0, b.length); n }

  override def reduce(b: Array[Long], v: Long): Array[Long] = {
    if (v <= 0) return b // non-positive values can never contribute to h
    val c = math.min(v, Cap.toLong).toInt
    val nb = grow(b, c)
    nb(c) += 1
    nb
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    val (big, small) = if (x.length >= y.length) (x, y) else (y, x)
    var i = 0
    while (i < small.length) { big(i) += small(i); i += 1 }
    big
  }

  override def finish(b: Array[Long]): Int = {
    // h = largest h such that #items with value >= h is >= h.
    var atLeast = 0L
    var v = b.length - 1
    while (v >= 1) {
      atLeast += b(v)
      if (atLeast >= v) return v
      v -= 1
    }
    0
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Int] = Encoders.scalaInt

  /** Column form: `hindex($"citations")`. */
  def hindex(values: Column): Column = udaf(HIndexAgg).apply(values)
}
