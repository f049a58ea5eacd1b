package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Element-wise exact-DECIMAL sum of a row's OUTER PRODUCT: slot (i·d + j) of
  * the result is `sum(cast(round(x[i] · x[j], scale) as decimal(30, scale)))`
  * cast back to double — bit-identical to exploding all d² (i, j, p) structs
  * per row (`Pca.cov`'s pre-round-14 shape) and running dsum per (i, j)
  * group, without materializing n·d² rows through a hash aggregate.
  *
  * The arithmetic ladder per addend is [[VecDsum]]'s, applied to the product
  * x[i]·x[j] (the same IEEE multiply the exploded form rounded): Round's
  * double path at `scale`, cast to decimal(30, scale) with non-ansi
  * overflow-to-null, exact BigDecimal addition, null elements skip the
  * addend, final Decimal.toDouble, decimal(38, scale) sum-overflow → null.
  * OuterDsumSpec (in VecDsumSpec.scala) pins slot-by-slot parity against the
  * exploded form.
  *
  * Contract: fixed-dim input rows (the covariance caller's embedding
  * column). A longer row than previously seen grows and REMAPS the buffer so
  * earlier (i, j) sums keep their cells; rows contribute addends only for
  * their own i, j < len — exactly the groups the exploded form would emit.
  */
case class OuterDsum(
    child: Expression, scale: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[OuterDsum.Buffer] with UnaryLike[Expression] {

  require(scale >= 0 && scale <= 30, s"scale=$scale must be in [0, 30]")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_outer_dsum"

  override def createAggregationBuffer(): OuterDsum.Buffer = new OuterDsum.Buffer

  override def update(buf: OuterDsum.Buffer, input: InternalRow): OuterDsum.Buffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[ArrayData], scale)
    buf
  }

  override def merge(buf: OuterDsum.Buffer, other: OuterDsum.Buffer): OuterDsum.Buffer =
    buf.mergeWith(other)

  override def eval(buf: OuterDsum.Buffer): Any = buf.result()

  override def serialize(buf: OuterDsum.Buffer): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): OuterDsum.Buffer =
    OuterDsum.Buffer.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(o: Int): OuterDsum =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): OuterDsum =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): OuterDsum =
    copy(child = newChild)
}

object OuterDsum {

  private def roundDouble(v: Double, scale: Int): Double =
    if (v.isNaN || v.isInfinite) v
    else java.math.BigDecimal.valueOf(v)
      .setScale(scale, java.math.RoundingMode.HALF_UP).doubleValue()

  /** d×d row-major accumulators; null slot = no non-null addend yet. */
  final class Buffer {
    private[OuterDsum] var dim: Int = 0
    private[OuterDsum] var sums: Array[java.math.BigDecimal] = Array.empty

    private[OuterDsum] def grow(n: Int): Unit = if (n > dim) {
      val next = new Array[java.math.BigDecimal](n * n)
      var i = 0
      while (i < dim) {
        System.arraycopy(sums, i * dim, next, i * n, dim)
        i += 1
      }
      dim = n
      sums = next
    }

    def add(arr: ArrayData, scale: Int): Unit = {
      val n = arr.numElements()
      grow(n)
      val xs = new Array[Double](n)
      val ok = new Array[Boolean](n)
      var i = 0
      while (i < n) {
        ok(i) = !arr.isNullAt(i)
        if (ok(i)) xs(i) = arr.getDouble(i)
        i += 1
      }
      i = 0
      while (i < n) {
        if (ok(i)) {
          var j = 0
          val row = i * dim
          while (j < n) {
            if (ok(j)) {
              val t = roundDouble(xs(i) * xs(j), scale)
              if (!t.isNaN && !t.isInfinite) {
                val d = java.math.BigDecimal.valueOf(t)
                  .setScale(scale, java.math.RoundingMode.HALF_UP)
                if (d.precision() <= 30) {
                  val k = row + j
                  sums(k) = if (sums(k) == null) d else sums(k).add(d)
                }
              }
            }
            j += 1
          }
        }
        i += 1
      }
    }

    def mergeWith(other: Buffer): Buffer = {
      grow(other.dim)
      var i = 0
      while (i < other.dim) {
        var j = 0
        while (j < other.dim) {
          val o = other.sums(i * other.dim + j)
          if (o != null) {
            val k = i * dim + j
            sums(k) = if (sums(k) == null) o else sums(k).add(o)
          }
          j += 1
        }
        i += 1
      }
      this
    }

    /** null when no row was ever added; per slot the VecDsum semantics. */
    def result(): Any = {
      if (dim == 0) return null
      val out = new Array[Any](dim * dim)
      var k = 0
      while (k < out.length) {
        val s = sums(k)
        out(k) =
          if (s == null || s.precision() > 38) null
          else java.lang.Double.valueOf(s.doubleValue())
        k += 1
      }
      new GenericArrayData(out)
    }

    def toBytes: Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val out = new java.io.DataOutputStream(bos)
      out.writeInt(dim)
      var k = 0
      while (k < sums.length) {
        val s = sums(k)
        if (s == null) out.writeInt(-1)
        else {
          val unscaled = s.unscaledValue().toByteArray
          out.writeInt(unscaled.length)
          out.write(unscaled)
          out.writeInt(s.scale())
        }
        k += 1
      }
      out.flush()
      bos.toByteArray
    }
  }

  object Buffer {
    def fromBytes(bytes: Array[Byte]): Buffer = {
      val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
      val b = new Buffer
      b.dim = in.readInt()
      b.sums = new Array[java.math.BigDecimal](b.dim * b.dim)
      var k = 0
      while (k < b.sums.length) {
        val len = in.readInt()
        if (len >= 0) {
          val u = new Array[Byte](len)
          in.readFully(u)
          b.sums(k) = new java.math.BigDecimal(
            new java.math.BigInteger(u), in.readInt())
        }
        k += 1
      }
      b
    }
  }

  /** Column-API surface: row-major d² array, slot i·d+j =
    * dsum(round(x[i]·x[j], scale), scale). */
  def apply(arr: Column, scale: Int): Column =
    ColumnBridge.column(
      OuterDsum(ColumnBridge.expression(arr), scale).toAggregateExpression())
}
