package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Element-wise weighted [[Exprs.dsum]] over an array<double> column: slot j
  * of the result is `sum(cast(round(coef · x[j], 12) as decimal(30, scale)))`
  * cast back to double — bit-identical to exploding the array with
  * `posexplode`, forming `round(coef · xj, 12)` per row and running dsum per
  * position, without materializing rows × dim exploded rows through a hash
  * aggregate.
  *
  * Built for the full-batch GD gradient ([[graft.ml.Logistic.train]]): each
  * round previously shuffled n·(d+1) (pos, term) rows into a (d+1)-group
  * aggregate; here the row coefficient (p − y) arrives as a scalar column —
  * evaluated ONCE per row, not per element (a transform-lambda formulation
  * would re-evaluate an inlined sigmoid per element after CollapseProject) —
  * and the fold runs in one pass. VecDsumSpec pins bit-parity against the
  * posexplode + dsum form.
  *
  * Arithmetic fidelity, step by step against the Spark expression ladder:
  *   - coef · x[j]: the same IEEE double multiply;
  *   - round(·, 12): Round's double path — java.math.BigDecimal.valueOf (the
  *     Double.toString-exact value scala.math.BigDecimal(d) wraps), setScale
  *     HALF_UP, back to double; NaN/Infinity pass through as Round's do;
  *   - cast(double as decimal(30, scale)): valueOf, setScale(scale, HALF_UP);
  *     precision > 30 → null, skipped — Spark's non-ansi overflow-to-null;
  *   - sum: exact BigDecimal addition (order-independent); null coef or null
  *     element → null term, skipped like sum; a slot with zero non-null
  *     addends evaluates to null, like sum;
  *   - final cast to double: BigDecimal.doubleValue — Decimal.toDouble;
  *   - sum-result overflow past decimal(38, scale) (sum's widened result
  *     type) nulls the slot, mirroring the non-ansi sum.
  *
  * Rows are dense fixed-dim in the GD caller; ragged inputs are handled the
  * way posexplode+groupBy would: the result is as long as the longest input,
  * shorter rows simply contribute no addend at the tail positions.
  */
case class VecDsum(
    left: Expression, right: Expression, scale: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VecDsum.Buffer] with BinaryLike[Expression] {

  require(scale >= 0 && scale <= 30, s"scale=$scale must be in [0, 30]")

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), DoubleType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<double>, double), got (${l.catalogString}, ${r.catalogString})")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_vec_dsum"

  override def createAggregationBuffer(): VecDsum.Buffer = new VecDsum.Buffer

  override def update(buf: VecDsum.Buffer, input: InternalRow): VecDsum.Buffer = {
    val arr = left.eval(input)
    val coef = right.eval(input)
    // null coef: every term round(null · xj) is null — no addend, like sum
    if (arr != null && coef != null)
      buf.addWeighted(arr.asInstanceOf[ArrayData],
        coef.asInstanceOf[java.lang.Double].doubleValue(), scale)
    buf
  }

  override def merge(buf: VecDsum.Buffer, other: VecDsum.Buffer): VecDsum.Buffer =
    buf.mergeWith(other)

  override def eval(buf: VecDsum.Buffer): Any = buf.result()

  override def serialize(buf: VecDsum.Buffer): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): VecDsum.Buffer =
    VecDsum.Buffer.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(o: Int): VecDsum =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VecDsum =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VecDsum =
    copy(left = newLeft, right = newRight)
}

object VecDsum {

  /** Spark Round's double path at the given scale (finite inputs; callers
    * guard NaN/Infinity). */
  private def roundDouble(v: Double, scale: Int): Double =
    if (v.isNaN || v.isInfinite) v
    else java.math.BigDecimal.valueOf(v)
      .setScale(scale, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Per-slot exact decimal accumulators; null slot = no non-null addend yet
    * (sum-over-empty semantics). Grows to the longest row seen. */
  final class Buffer {
    private[VecDsum] var sums: Array[java.math.BigDecimal] = Array.empty

    private def grow(n: Int): Unit =
      if (sums.length < n) sums = java.util.Arrays.copyOf(sums, n)

    def addWeighted(arr: ArrayData, coef: Double, scale: Int): Unit = {
      val n = arr.numElements()
      grow(n)
      var j = 0
      while (j < n) {
        if (!arr.isNullAt(j)) {
          val t = roundDouble(coef * arr.getDouble(j), scale) // Round(·, scale)
          if (!t.isNaN && !t.isInfinite) {
            // cast(double as decimal(30, scale)); precision > 30 → null, skipped
            val d = java.math.BigDecimal.valueOf(t)
              .setScale(scale, java.math.RoundingMode.HALF_UP)
            if (d.precision() <= 30) {
              sums(j) = if (sums(j) == null) d else sums(j).add(d)
            }
          }
        }
        j += 1
      }
    }

    def mergeWith(other: Buffer): Buffer = {
      grow(other.sums.length)
      var j = 0
      while (j < other.sums.length) {
        val o = other.sums(j)
        if (o != null) sums(j) = if (sums(j) == null) o else sums(j).add(o)
        j += 1
      }
      this
    }

    /** null when no row was ever added (global sum over zero rows is null);
      * per slot: null when no addend, null when the exact sum overflows the
      * decimal(38, scale) sum-result type, else the double value. */
    def result(): Any = {
      if (sums.length == 0) return null
      val out = new Array[Any](sums.length)
      var j = 0
      while (j < sums.length) {
        val s = sums(j)
        out(j) =
          if (s == null || s.precision() > 38) null
          else java.lang.Double.valueOf(s.doubleValue())
        j += 1
      }
      new GenericArrayData(out)
    }

    def toBytes: Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val out = new java.io.DataOutputStream(bos)
      out.writeInt(sums.length)
      var j = 0
      while (j < sums.length) {
        val s = sums(j)
        if (s == null) out.writeInt(-1)
        else {
          val unscaled = s.unscaledValue().toByteArray
          out.writeInt(unscaled.length)
          out.write(unscaled)
          out.writeInt(s.scale())
        }
        j += 1
      }
      out.flush()
      bos.toByteArray
    }
  }

  object Buffer {
    def fromBytes(bytes: Array[Byte]): Buffer = {
      val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
      val b = new Buffer
      val n = in.readInt()
      b.sums = new Array[java.math.BigDecimal](n)
      var j = 0
      while (j < n) {
        val len = in.readInt()
        if (len >= 0) {
          val u = new Array[Byte](len)
          in.readFully(u)
          b.sums(j) = new java.math.BigDecimal(
            new java.math.BigInteger(u), in.readInt())
        }
        j += 1
      }
      b
    }
  }

  /** Column-API surface: slot j = dsum(round(coef · arr[j], 12), scale). */
  def apply(arr: Column, coef: Column, scale: Int): Column =
    ColumnBridge.column(
      VecDsum(ColumnBridge.expression(arr), ColumnBridge.expression(coef),
        scale).toAggregateExpression())
}
