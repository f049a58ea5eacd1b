package graft.operators

import graft.functions.Exprs
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count–Min sketch (Cormode & Muthukrishnan 2005): a depth×width counter
  * matrix where every (key, count) increments one cell per row at
  * h_j(key) mod width; a key's point estimate is the MIN of its depth
  * cells — always ≥ the true count (collisions only ADD), within
  * ε·N with probability 1−δ for width = e/ε, depth = ln(1/δ).
  *
  * The Spark shape IS the sketch's scale story: the counter matrix is a
  * (j, cell)-keyed grouped SUM — map-side combined, so the exchange
  * carries at most depth·width partials per partition no matter the
  * corpus, and the finished sketch is depth·width rows (KB-sized state
  * from TB-sized input). Sums are trivially mergeable, which is what
  * makes the sketch shard- and stream-friendly: union the inputs (or the
  * sketches) and the same groupBy re-yields the merged matrix.
  *
  * Hashes are [[Exprs.h60]] (md5-derived), so the whole matrix and every
  * estimate replays exactly in the DuckDB oracle — unlike the q59/q85
  * sketches whose engine-internal state forces a tolerance contract,
  * this one is full hash-match (the q34/q35 verification-mode stance).
  */
object CountMin {

  /** Row-j cell index for a key: h60("cm" + j + ":" + key) mod width. */
  def cell(j: Column, key: Column, width: Int): Column =
    pmod(Exprs.h60(concat(lit("cm"), j.cast("string"), lit(":"), key)),
      lit(width.toLong))

  /** Build the counter matrix from (key, cnt) rows → (j, cell, c).
    * Cells never touched stay absent (a sparse matrix — [[estimate]]
    * reads absence as zero). */
  def build(keyed: DataFrame, depth: Int, width: Int): DataFrame = {
    require(depth >= 1, s"CountMin depth must be >= 1, got $depth")
    require(width >= 1, s"CountMin width must be >= 1, got $width")
    keyed
      .select(col("key"), col("cnt"),
        explode(sequence(lit(0), lit(depth - 1))).as("j"))
      .select(col("j"), cell(col("j"), col("key"), width).as("cell"), col("cnt"))
      .groupBy(col("j"), col("cell"))
      .agg(sum(col("cnt")).as("c"))
  }

  /** Point estimates for a probe key set: min over the key's depth cells.
    * The sketch (≤ depth·width rows) broadcasts; probes stream. A probe
    * key the sketch never saw estimates 0 (absent cell = zero). */
  def estimate(probes: DataFrame, sketch: DataFrame, depth: Int, width: Int): DataFrame =
    probes
      .select(col("key"), explode(sequence(lit(0), lit(depth - 1))).as("j"))
      .select(col("key"), col("j"), cell(col("j"), col("key"), width).as("cell"))
      .join(broadcast(sketch), Seq("j", "cell"), "left")
      .groupBy(col("key"))
      .agg(min(coalesce(col("c"), lit(0L))).as("est"))
}
