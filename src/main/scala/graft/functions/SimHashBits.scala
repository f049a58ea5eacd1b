package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native single-pass SimHash fingerprint over a token array.
  *
  * Bit j of the fingerprint is the sign of Σ_t cnt(t) · (±1 by bit j of
  * hash(t)) — and since each term contributes its hash sign once per
  * OCCURRENCE, the per-term-count formulation collapses to one pass over the
  * raw token array: no per-(doc, term) count aggregation, no per-(doc, bit)
  * explode, no shuffles at all. Bit-equal to the grouped pipeline in
  * [[graft.operators.Dedup.simhash]] (integer sums are order-independent;
  * parity spec-asserted in DedupSimilaritySpec), which stays as the
  * cross-check twin. Hashes: portable md5-h60 (60 bits, SQL-replayable) or
  * xxhash64 (64 bits) — same dispatch as the rest of the dedup family.
  *
  * Empty token array → null (the grouped pipeline emits no row for a doc
  * with no tokens; callers filter or coalesce explicitly).
  */
case class SimHashBits(child: Expression, portable: Boolean)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_simhash"

  // analysis-time input validation: without this, a non-string array reaches
  // nullSafeEval and dies at executor runtime with ClassCastException
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${other.catalogString}")
  }

  private val nbits = if (portable) 60 else 64

  @transient private lazy val md5 = java.security.MessageDigest.getInstance("MD5")

  private def h60(digest: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (digest(i) & 0xffL); i += 1 }
    (v << 4) | ((digest(7) & 0xffL) >>> 4)
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val sums = new Array[Long](nbits)
    var i = 0
    while (i < n) {
      val tok = arr.getUTF8String(i)
      val h = if (portable) { md5.reset(); h60(md5.digest(tok.getBytes)) }
              else XxHash64Function.hash(tok, StringType, 42L)
      var j = 0
      while (j < nbits) {
        if (((h >>> j) & 1L) == 1L) sums(j) += 1 else sums(j) -= 1
        j += 1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < nbits) { if (sums(j) > 0) fp |= 1L << j; j += 1 }
    fp
  }

  override protected def withNewChildInternal(c: Expression): SimHashBits =
    copy(child = c)
}

object SimHashBits {
  /** Column-API surface over an already-computed token-array column. */
  def apply(tokens: Column, portable: Boolean): Column =
    ColumnBridge.column(SimHashBits(ColumnBridge.expression(tokens), portable))
}
