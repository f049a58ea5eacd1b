package graft.operators

import graft.functions.Exprs.h60
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Portable Bloom-filter membership for set-pruning at corpus scale —
  * the decontamination shape when the benchmark/blocklist set outgrows an
  * exact broadcast set (q73 broadcasts the shingles themselves; fine for an
  * eval suite, wrong for a multi-billion-entry blocklist).
  *
  * The filter is m bits with k hash functions; all hashes derive from
  * [[graft.functions.Exprs.h60]] (md5-based), so another engine can replay
  * membership bit-for-bit — false positives included — which is what makes
  * a Bloom query oracle-able: the FP set is a deterministic function of
  * (m, k, member set), not of an engine-private hash.
  *
  * Scale shape (100 TB):
  *   - build: one distinct over the member set's bit positions, driver
  *     materialization bounded by m BITS regardless of member count
  *     (m = 2^18 → a 32 KiB bitmap; a billion-entry blocklist still ships
  *     as 32 KiB once m is sized for its FP target),
  *   - probe: the bitmap rides the plan as a constant array<long>; the
  *     membership test is `getbit` over plan-local arithmetic — pure
  *     whole-stage-codegen row work, ZERO joins and ZERO shuffles on the
  *     probed corpus (vs one wide shuffle for the q73 broadcast join).
  */
object Bloom {

  /** k bit positions of a string column: h60(i ++ ":" ++ x) mod m for
    * i in 0..k-1. Position j of the array is hash seed j. */
  def positions(c: Column, k: Int, m: Int): Column =
    array((0 until k).map(i => pmod(h60(concat(lit(s"$i:"), c)), lit(m.toLong))): _*)

  /** Build the bitmap for every string in `members` (one column expected).
    * Driver-side result is bounded by m bits by construction. */
  def build(members: DataFrame, k: Int, m: Int): Array[Long] = {
    require(m % 64 == 0, s"m must be a multiple of 64, got $m")
    val c = col(members.columns.head)
    val bits = members.select(explode(positions(c, k, m)).as("b")).distinct()
      .collect().map(_.getLong(0))
    val words = new Array[Long](m / 64)
    bits.foreach(b => words(b.toInt / 64) |= (1L << (b.toInt % 64)))
    words
  }

  /** True iff every position in `pos` (an array<long> of bit indices) is set
    * in `words`. With `pos = positions(x, k, m)` this is the Bloom membership
    * test: definitely-absent → false, present-or-collision → true. */
  def containsAll(words: Array[Long], pos: Column): Column = {
    val wordsLit = typedlit(words.toSeq)
    forall(pos, p =>
      call_function("getbit",
        element_at(wordsLit, (p / lit(64)).cast("int") + lit(1)),
        (p % lit(64)).cast("int")) === lit(1))
  }
}
