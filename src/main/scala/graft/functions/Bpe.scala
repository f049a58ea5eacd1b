package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding primitives (Sennrich et al., "Neural Machine
  * Translation of Rare Words with Subword Units", ACL 2016) as native
  * Catalyst expressions — the per-row half of the BPE operator
  * ([[graft.operators.Bpe]] owns the distributed merge-training loop).
  *
  * Merge-application semantics (shared by both expressions, and replayed
  * verbatim by the DuckDB oracle's `list_reduce` fold): one pass left to
  * right; whenever the current symbol equals `l` and its successor equals
  * `r`, emit the concatenation `l+r` and skip both. The merged symbol is
  * never reconsidered as a left operand within the same pass — equivalent
  * to the fold formulation because `l+r = l` is impossible for non-empty
  * `r`, so no chain can start at a just-merged symbol.
  */
object BpeOps {
  /** One greedy left-to-right merge pass. */
  private[graft] def mergePass(syms: Array[String], l: String, r: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += l + r; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }
}

/** Apply ONE trained merge `(l, r)` to a symbol-array column — the
  * per-round step of the distributed training loop. `l`/`r` are plan-time
  * parameters (they come from the previous round's argmax), so each round
  * compiles a fresh tight scan, the [[GreedySegment]] pattern. */
case class BpeMergeStep(child: Expression, l: String, r: String)
    extends UnaryExpression with CodegenFallback {

  require(l.nonEmpty && r.nonEmpty, "merge symbols must be non-empty")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_merge_step"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val syms = new Array[String](n)
    var i = 0
    while (i < n) { syms(i) = arr.getUTF8String(i).toString; i += 1 }
    val merged = BpeOps.mergePass(syms, l, r)
    if (merged.length == n) input // no occurrence: reuse the input array
    else new GenericArrayData(merged.map(s => UTF8String.fromString(s): Any))
  }

  override protected def withNewChildInternal(c: Expression): BpeMergeStep =
    copy(child = c)
}

/** Encode a token-array column with a trained merge table: each token is
  * split to characters, every merge is applied in rank order (exactly the
  * training-state evolution, so encoding a training word reproduces its
  * final training segmentation), and the per-token subwords concatenate in
  * token order. The merge table is a plan-time constant — driver-sized
  * (numMerges entries), shipped inside the serialized expression like a
  * broadcast of the model.
  *
  * Cost is O(numMerges × token length) per token — right for the
  * oracle-sized tables here; a production-sized table (30–60k merges)
  * would swap the loop body for the rank-priority formulation (repeatedly
  * merge the lowest-rank adjacent pair — the standard equivalent of
  * sequential application) with a pair→rank hash, leaving the expression
  * contract and the plan shape unchanged. */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${other.catalogString}")
  }

  @transient private lazy val mergeArr: Array[(String, String)] = merges.toArray

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var t = 0
    while (t < n) {
      val tok = arr.getUTF8String(t).toString
      var syms = new Array[String](tok.length)
      var c = 0
      while (c < tok.length) { syms(c) = String.valueOf(tok.charAt(c)); c += 1 }
      var m = 0
      while (m < mergeArr.length && syms.length > 1) {
        syms = BpeOps.mergePass(syms, mergeArr(m)._1, mergeArr(m)._2)
        m += 1
      }
      var j = 0
      while (j < syms.length) { out += UTF8String.fromString(syms(j)); j += 1 }
      t += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(c: Expression): BpeEncode =
    copy(child = c)
}

object BpeMergeStep {
  def apply(syms: Column, l: String, r: String): Column =
    ColumnBridge.column(BpeMergeStep(ColumnBridge.expression(syms), l, r))
}

object BpeEncode {
  def apply(tokens: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(BpeEncode(ColumnBridge.expression(tokens), merges))
}
