package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** SimHash as a typed custom aggregate (the Aggregator extension axis):
  * folds 64-bit word hashes into a 64-lane sign counter, merges
  * partially (map-side combine works like any algebraic aggregate),
  * and finishes to the fingerprint. Equivalent by construction to the
  * 64-sum relational form in TextOps.dedupSimhash (test-pinned) — that
  * form stays in the catalog for whole-stage codegen; this one is the
  * reusable aggregate for Dataset pipelines.
  */
object SimHashAggregator extends Aggregator[Long, Array[Int], Long] {

  override def zero: Array[Int] = new Array[Int](64)

  override def reduce(buf: Array[Int], wordHash: Long): Array[Int] = {
    var b = 0
    while (b < 64) {
      buf(b) += (if (((wordHash >>> b) & 1L) == 1L) 1 else -1)
      b += 1
    }
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < 64) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Int]): Long = {
    var sim = 0L
    var b = 0
    while (b < 64) {
      if (buf(b) > 0) sim |= (1L << b)
      b += 1
    }
    sim
  }

  // native ArrayType(IntegerType) buffer encoding — the partial buffer
  // crosses the map-side shuffle on every merge, so it must not fall
  // back to opaque Java serialization
  override def bufferEncoder: Encoder[Array[Int]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Int]]()
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
