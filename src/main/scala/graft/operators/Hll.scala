package graft.operators

import graft.functions.Exprs
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Portable HyperLogLog (Flajolet et al. 2007) with m = 64 registers over
  * the md5-derived [[Exprs.h60]] hash — the full-hash-match sibling of
  * q59's engine-internal `approx_count_distinct` (whose sketch state
  * forces a tolerance contract; this one replays register-for-register in
  * the oracle, the q128 stance).
  *
  * Register update is a grouped MAX of integer ranks — order-independent,
  * mergeable (max of maxes), map-side combined to ≤ m partials per
  * partition: the same KB-from-TB scale shape as Count–Min. The harmonic
  * denominator Σ 2^(−M_j) is computed in EXACT INTEGER form as
  * Σ 2^(55−M_j) (≤ 64·2^55 < 2^61, fits a long) so the sum is
  * order-independent too; only the final α·m²/denom division and the
  * small-range ln correction are floating point, and those replay
  * identically as single expressions.
  *
  * Hash split: bucket = h mod 64, value v = h div 64 (54 bits);
  * rank = leading-zeros(v) + 1 = 55 − bitlength(v), with v = 0 → 55.
  * `bin()` gives bitlength portably in both engines.
  */
object Hll {

  val m = 64

  /** (group..., bucket, r) registers from a string key column. */
  def registers(df: DataFrame, groupCols: Seq[String], keyCol: String): DataFrame = {
    val h = Exprs.h60(col(keyCol).cast("string"))
    val withHash = df.select((groupCols.map(col) :+ h.as("hh")): _*)
      .select((groupCols.map(col) :+
        pmod(col("hh"), lit(m.toLong)).as("bucket") :+
        expr(s"hh div $m").as("v")): _*)
    val rank = when(col("v") === 0L, lit(55))
      .otherwise(lit(55) - length(bin(col("v"))))
    withHash
      .select((groupCols.map(col) :+ col("bucket") :+ rank.cast("int").as("r")): _*)
      .groupBy((groupCols.map(col) :+ col("bucket")): _*)
      .agg(max(col("r")).as("r"))
  }

  /** Per-group estimate from the registers: (group..., reg_sum, hll_est).
    * reg_sum is the integer register checksum (hash-match anchor); hll_est
    * is the bias-corrected estimate with the small-range correction,
    * rounded to 6 dp. */
  def estimate(regs: DataFrame, groupCols: Seq[String]): DataFrame = {
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(64.0))
    val p55 = math.pow(2.0, 55).toLong
    val agg = regs.groupBy(groupCols.map(col): _*)
      .agg(sum(pow(lit(2.0), (lit(55) - col("r")).cast("double")).cast("long")).as("isum"),
        count(lit(1)).as("np"),
        sum(col("r")).cast("long").as("reg_sum"))
    val denomInt = col("isum") + (lit(m.toLong) - col("np")) * lit(p55)
    val raw = alpha * lit(4096.0) / (denomInt.cast("double") / lit(p55.toDouble))
    val zeros = (lit(m.toLong) - col("np"))
    val est = when(raw <= lit(160.0) && zeros > 0L,
      lit(64.0) * log(lit(64.0) / zeros.cast("double"))).otherwise(raw)
    agg.select((groupCols.map(col) :+ col("reg_sum") :+
      round(est, 6).as("hll_est")): _*)
  }
}
