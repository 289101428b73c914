package graft.functions

import java.math.{BigDecimal => JBigDecimal, BigInteger, RoundingMode}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Mutable moment buffer for [[CovMomentsAgg]]: the full
  * upper-triangle second-moment state of a d-dim embedding stream —
  * d²/2 + d scaled-long accumulators plus the row count — merged
  * map-side, so the shuffle carries ONE ~17 KB buffer per partition
  * regardless of row count.
  *
  * Accumulators hold decimal(…,12) UNSCALED values (v × 10¹²) as
  * longs; `highs` is a lazily-allocated BigInteger spill so an
  * accumulation that outgrows a long (≈9.2 × 10¹⁸ scaled ≈ 9.2 × 10⁶
  * in value — reachable at 100 TB row counts) stays exact instead of
  * wrapping.
  */
final class CovMomentsBuffer(var d: Int) {
  var n: Long = 0L
  // triangular pair index: (i, j) with i <= j lives at j*(j+1)/2 + i —
  // PREFIX-STABLE when d grows, so a late wider row only extends arrays
  var pairs: Array[Long] = new Array[Long](d * (d + 1) / 2)
  var dims: Array[Long] = new Array[Long](d)
  var pairHighs: Array[BigInteger] = _
  var dimHighs: Array[BigInteger] = _

  def grow(newD: Int): Unit = {
    if (newD > d) {
      pairs = java.util.Arrays.copyOf(pairs, newD * (newD + 1) / 2)
      dims = java.util.Arrays.copyOf(dims, newD)
      if (pairHighs != null) pairHighs = java.util.Arrays.copyOf(pairHighs, newD * (newD + 1) / 2)
      if (dimHighs != null) dimHighs = java.util.Arrays.copyOf(dimHighs, newD)
      d = newD
    }
  }

  @inline def addPair(k: Int, v: Long): Unit = {
    val s = pairs(k) + v
    // overflow check (same trick as Math.addExact, without the throw)
    if (((pairs(k) ^ s) & (v ^ s)) < 0) {
      if (pairHighs == null) pairHighs = new Array[BigInteger](pairs.length)
      val h = if (pairHighs(k) == null) BigInteger.ZERO else pairHighs(k)
      pairHighs(k) = h.add(BigInteger.valueOf(pairs(k)))
      pairs(k) = v
    } else pairs(k) = s
  }

  @inline def addDim(i: Int, v: Long): Unit = {
    val s = dims(i) + v
    if (((dims(i) ^ s) & (v ^ s)) < 0) {
      if (dimHighs == null) dimHighs = new Array[BigInteger](dims.length)
      val h = if (dimHighs(i) == null) BigInteger.ZERO else dimHighs(i)
      dimHighs(i) = h.add(BigInteger.valueOf(dims(i)))
      dims(i) = v
    } else dims(i) = s
  }

  def pairTotal(k: Int): BigInteger = {
    val low = BigInteger.valueOf(pairs(k))
    if (pairHighs != null && pairHighs(k) != null) pairHighs(k).add(low) else low
  }

  def dimTotal(i: Int): BigInteger = {
    val low = BigInteger.valueOf(dims(i))
    if (dimHighs != null && dimHighs(i) != null) dimHighs(i).add(low) else low
  }
}

object CovMomentsAgg {

  /** Spark-exact scaled rounding: the unscaled long of
    * `round(p, 12).cast(decimal(38,12))` as Spark computes it —
    * shortest-decimal-string of the double, HALF_UP at 12 dp (both the
    * Round expression and the double→decimal Cast go through
    * `BigDecimal(Double.toString(_))`, and the round-trip through the
    * intermediate double is value-preserving for |p| ≪ 10³ because
    * ulp(p) ≪ 10⁻¹²).
    *
    * Fast path: scale by 1e12 in double math and floor/ceil-with-half;
    * the combined error of the binary product-to-shortest-decimal
    * wobble and the ×1e12 multiply is < 10⁻³ units for |p| ≤ 100, so
    * any value ≥ 10⁻² away from a .5 boundary is decided exactly; the
    * rare boundary case falls back to the BigDecimal composition.
    */
  @inline def scaled12(p: Double): Long = {
    val q = p * 1e12
    // Gate at 1e13 (|p| ≤ 10), NOT the 4e15 long-exact bound: the 1e-2
    // boundary margin below only covers the shortest-decimal wobble +
    // ×1e12 error while ulp(q) ≤ ~2e-3 — true for |q| < 1e13. Between
    // 1e13 and 4e15 the combined float error can reach ~0.7 scaled
    // units, so a product near a .5 boundary could round differently
    // from the Spark-exact slow path; those (rare for unit-scale
    // embeddings) take slow12.
    if (java.lang.Math.abs(q) < 1.0e13) {
      val t = if (p >= 0) q + 0.5 else q - 0.5
      val r = if (p >= 0) java.lang.Math.floor(t) else java.lang.Math.ceil(t)
      val dist = java.lang.Math.abs(t - r)
      // accept only when clearly inside the cell: not within 1e-2 of
      // either edge (an edge is exactly the x.5 decision boundary)
      if (dist > 1.0e-2 && dist < 1.0 - 1.0e-2) return r.toLong
    }
    slow12(p)
  }

  private def slow12(p: Double): Long = {
    // exact replication of Spark's round(p, 12) → cast to decimal(38,12)
    val rounded = new JBigDecimal(java.lang.Double.toString(p))
      .setScale(12, RoundingMode.HALF_UP).doubleValue()
    new JBigDecimal(java.lang.Double.toString(rounded))
      .setScale(12, RoundingMode.HALF_UP).unscaledValue().longValueExact()
  }
}

/** Native moment aggregate under embed_covariance (#295/#298): one
  * pass over `array<double>` embeddings producing the SAME (i, j, v)
  * moment frame as the posexplode/Generate formulation — cross sums
  * Σ round₁₂(xᵢ·xⱼ) for i ≤ j at (i, j), per-dim sums Σ round₁₂(xᵢ)
  * at (i, −1), the row count at (−1, −1), every v an exact
  * DECIMAL(38,12) — but WITHOUT materializing d²/2 structs per row
  * through a Generate: the products accumulate into a fixed ~17 KB
  * per-partition buffer (ObjectHashAggregate), so the plan is
  * scan → partial agg → single-row exchange → explode. Replaces the
  * 2,080-row-per-vector explode that made #295 the catalog's slowest
  * entry (8.2 s at sf0.1).
  *
  * Output: array<struct<i:int, j:int, v:decimal(38,12)>> — explode it
  * to recover the moment frame consumed by covTail / the incremental
  * keyed merge.
  */
case class CovMomentsAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CovMomentsBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false

  private val valueType = DecimalType(38, 12)

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("i", IntegerType, nullable = false),
      StructField("j", IntegerType, nullable = false),
      StructField("v", valueType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): CovMomentsBuffer = new CovMomentsBuffer(0)

  override def update(buf: CovMomentsBuffer, input: InternalRow): CovMomentsBuffer = {
    val arr = child.eval(input)
    if (arr == null) return buf
    val a = arr.asInstanceOf[ArrayData]
    val d = a.numElements()
    if (d > buf.d) buf.grow(d)
    buf.n += 1
    val xs = new Array[Double](d)
    var i = 0
    while (i < d) { xs(i) = a.getDouble(i); i += 1 }
    var j = 0
    while (j < d) {
      val xj = xs(j)
      val base = j * (j + 1) / 2
      var k = 0
      while (k <= j) {
        buf.addPair(base + k, CovMomentsAgg.scaled12(xs(k) * xj))
        k += 1
      }
      buf.addDim(j, CovMomentsAgg.scaled12(xj))
      j += 1
    }
    buf
  }

  override def merge(a: CovMomentsBuffer, b: CovMomentsBuffer): CovMomentsBuffer = {
    if (b.d > a.d) a.grow(b.d)
    a.n += b.n
    var k = 0
    while (k < b.pairs.length) {
      a.addPair(k, b.pairs(k))
      if (b.pairHighs != null && b.pairHighs(k) != null) {
        if (a.pairHighs == null) a.pairHighs = new Array[BigInteger](a.pairs.length)
        val h = if (a.pairHighs(k) == null) BigInteger.ZERO else a.pairHighs(k)
        a.pairHighs(k) = h.add(b.pairHighs(k))
      }
      k += 1
    }
    var i = 0
    while (i < b.dims.length) {
      a.addDim(i, b.dims(i))
      if (b.dimHighs != null && b.dimHighs(i) != null) {
        if (a.dimHighs == null) a.dimHighs = new Array[BigInteger](a.dims.length)
        val h = if (a.dimHighs(i) == null) BigInteger.ZERO else a.dimHighs(i)
        a.dimHighs(i) = h.add(b.dimHighs(i))
      }
      i += 1
    }
    a
  }

  override def eval(buf: CovMomentsBuffer): Any = {
    val rows = new Array[Any](buf.pairs.length + buf.d + 1)
    var out = 0
    var j = 0
    while (j < buf.d) {
      val base = j * (j + 1) / 2
      var i = 0
      while (i <= j) {
        // emitted as (i, j) with i <= j, matching the Generate form
        rows(out) = InternalRow(i, j, Decimal(new JBigDecimal(buf.pairTotal(base + i), 12), 38, 12))
        out += 1
        i += 1
      }
      j += 1
    }
    var i = 0
    while (i < buf.d) {
      rows(out) = InternalRow(i, -1, Decimal(new JBigDecimal(buf.dimTotal(i), 12), 38, 12))
      out += 1
      i += 1
    }
    rows(out) = InternalRow(-1, -1, Decimal(new JBigDecimal(BigInteger.valueOf(buf.n)).setScale(12), 38, 12))
    new GenericArrayData(rows)
  }

  override def serialize(buf: CovMomentsBuffer): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.d)
    out.writeLong(buf.n)
    def writeSide(lows: Array[Long], highs: Array[BigInteger]): Unit = {
      var k = 0
      while (k < lows.length) {
        out.writeLong(lows(k))
        val h = if (highs != null) highs(k) else null
        if (h == null) out.writeInt(0)
        else {
          val bytes = h.toByteArray
          out.writeInt(bytes.length)
          out.write(bytes)
        }
        k += 1
      }
    }
    writeSide(buf.pairs, buf.pairHighs)
    writeSide(buf.dims, buf.dimHighs)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): CovMomentsBuffer = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val d = in.readInt()
    val buf = new CovMomentsBuffer(d)
    buf.n = in.readLong()
    def readSide(lows: Array[Long]): Array[BigInteger] = {
      var highs: Array[BigInteger] = null
      var k = 0
      while (k < lows.length) {
        lows(k) = in.readLong()
        val len = in.readInt()
        if (len > 0) {
          val b = new Array[Byte](len)
          in.readFully(b)
          if (highs == null) highs = new Array[BigInteger](lows.length)
          highs(k) = new BigInteger(b)
        }
        k += 1
      }
      highs
    }
    buf.pairHighs = readSide(buf.pairs)
    buf.dimHighs = readSide(buf.dims)
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): CovMomentsAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CovMomentsAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): CovMomentsAgg =
    copy(child = newChildren(0))
}
