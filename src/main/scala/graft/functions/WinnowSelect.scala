package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native winnowing selector: token array → window-min fingerprint stream,
  * one tight JVM loop per row. Fuses the three interpreted-HOF layers of
  * the pure-Catalyst formulation — `shingles` (k-gram join), the per-gram
  * `h60` hash, and `winnowMins` (slice + array_min per window) — each of
  * which pays Catalyst's interpreted-lambda cost per element (the
  * measured ~1 s/5000-doc penalty SCALING.md's q211 adjudication accepted
  * in exchange for deleting the corpus-sized gram-hash exchange; this
  * expression removes the penalty too). One interpreted call per ROW
  * (CodegenFallback), the GreedySegment/CharEntropyStats escalation.
  *
  * Semantics are bit-identical to the HOF chain (WinnowingSpec asserts
  * parity): gram i = toks[i..i+k) joined with spaces; hash = h60 (first
  * 15 hex chars of md5, the portable oracle hash); output element j =
  * min(hash[j..j+w)), one per full window; empty when fewer than w grams.
  * Row-local ⇒ zero exchanges, stream-safe (StreamingWinnowing posture).
  */
case class WinnowSelect(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {

  require(k >= 1 && w >= 1, "k and w must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow_select"

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val nGrams = n - k + 1
    if (nGrams < w) return new GenericArrayData(Array.emptyLongArray)
    val md = java.security.MessageDigest.getInstance("MD5")
    val hs = new Array[Long](nGrams)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < nGrams) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks.getUTF8String(i + j).toString)
        j += 1
      }
      md.reset()
      val dig = md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // h60: first 15 hex chars = upper 60 bits of the digest
      var h = 0L
      var b = 0
      while (b < 8) {
        val v = dig(b) & 0xff
        if (b < 7) h = (h << 8) | v
        else h = (h << 4) | (v >>> 4) // 15th hex char is the high nibble
        b += 1
      }
      hs(i) = h
      i += 1
    }
    val nWins = nGrams - w + 1
    val out = new Array[Long](nWins)
    i = 0
    while (i < nWins) {
      var m = hs(i)
      var j = 1
      while (j < w) { if (hs(i + j) < m) m = hs(i + j); j += 1 }
      out(i) = m
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): WinnowSelect =
    copy(child = c)
}

object WinnowSelect {
  /** Column-API surface: window-min fingerprints of a token-array column. */
  def apply(toks: Column, k: Int, w: Int): Column =
    ColumnBridge.column(WinnowSelect(ColumnBridge.expression(toks), k, w))
}
