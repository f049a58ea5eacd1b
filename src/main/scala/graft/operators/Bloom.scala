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

  /** k bit positions via the engine-internal xxhash64 — an order of
    * magnitude cheaper per row than the md5-derived [[positions]]. Use
    * whenever no other engine needs to replay WHICH rows pass: pruning
    * ([[prunedJoin]] — false positives die in the exact join) wants this;
    * a membership-replay oracle (q92) needs the portable [[positions]]. */
  def fastPositions(c: Column, k: Int, m: Int): Column =
    array((0 until k).map(i => pmod(xxhash64(lit(i), c), lit(m.toLong))): _*)

  /** Build the bitmap for every string in `members` (one column expected).
    * Driver-side result is bounded by m bits by construction. */
  def build(members: DataFrame, k: Int, m: Int): Array[Long] =
    buildWith(members, c => positions(c, k, m), m)

  private def buildWith(members: DataFrame, pos: Column => Column, m: Int): Array[Long] = {
    require(m % 64 == 0, s"m must be a multiple of 64, got $m")
    val c = col(members.columns.head)
    val bits = members.select(explode(pos(c)).as("b")).distinct()
      .collect().map(_.getLong(0))
    val words = new Array[Long](m / 64)
    bits.foreach(b => words(b.toInt / 64) |= (1L << (b.toInt % 64)))
    words
  }

  /** Runtime-filter-shaped equi join: build a Bloom filter over the dim
    * side's join keys, prune the fact side with it BEFORE the shuffle, then
    * join exactly. Semantics identical to `fact ⋈ dim` (inner) — Bloom false
    * positives survive the prune but not the exact join — so the operator is
    * oracle-exact while shuffling only the ~selectivity·N fact rows that can
    * possibly match, instead of all of them.
    *
    * This is the manual form of what engines do with runtime filters /
    * dynamic partition pruning when the dim side carries a selective
    * predicate the fact scan can't see. At 100 TB the win is the shuffle:
    * a 1%-selective dim turns a full-fact exchange into a ~1% exchange for
    * the cost of one m-bit broadcast (32 KiB at m=2^18) and a per-row hash.
    *
    * `build` runs a driver action at plan-build time (bounded by m bits,
    * same documented pattern as the dim peeks in Knn/Similarity). Keys are
    * compared via their canonical string form on BOTH sides, so the filter
    * never diverges from the join condition. Positions use the
    * engine-internal [[fastPositions]]: which rows pass the prune is
    * invisible in the result (the exact join removes every false
    * positive), so there is nothing for another engine to replay and no
    * reason to pay md5 on every fact row. */
  def prunedJoin(fact: DataFrame, factKey: String, dim: DataFrame, dimKey: String,
                 k: Int = 5, m: Int = 1 << 18): DataFrame = {
    val pos: Column => Column = c => fastPositions(c, k, m)
    val words = buildWith(dim.select(col(dimKey).cast("string")).distinct(), pos, m)
    fact.filter(containsAll(words, pos(col(factKey).cast("string"))))
      .join(dim, col(factKey) === col(dimKey))
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
