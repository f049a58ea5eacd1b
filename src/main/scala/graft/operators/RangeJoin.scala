package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join without a cross product — an operator
  * Spark lacks natively: a plain `p.ts BETWEEN i.start AND i.end` join has
  * no equi key, so Catalyst falls back to BroadcastNestedLoopJoin (every
  * point × every interval — fine for a handful of intervals, quadratic death
  * at corpus scale).
  *
  * This is the standard bin-bucketing decomposition (SURVEY.md preference
  * order (a): compose existing ops): intervals explode to the fixed-width
  * bins they cover, points map to the single bin containing them, the join
  * becomes an equi join on the bin id, and the exact range predicate is
  * re-checked on the equi-matched pairs. Each true (point, interval) pair
  * meets in EXACTLY one bin — the point's — so the output needs no distinct.
  *
  * Scale shape: shuffle on `_bin` (hash-partitionable, AQE-skew-splittable),
  * join work = Σ over bins of |points in bin| × |intervals covering bin| —
  * linear in both inputs for bounded interval length / bin density, vs the
  * nested-loop |P| × |I|. `binWidth` tunes the tradeoff: ~the median
  * interval length keeps the per-interval fan-out at O(1) bins while
  * keeping bins selective. Degenerate long intervals fan out into
  * length/binWidth bin rows (document and cap upstream if intervals are
  * adversarial).
  */
object RangeJoin {

  /** Join each row of `points` to every row of `intervals` whose
    * [`startCol`, `endCol`) half-open range contains `ptCol`. All three
    * columns must share one NON-NEGATIVE integral domain (e.g. unix micros;
    * `DIV` truncates toward zero, so negative coordinates would mis-bin at
    * boundaries — shift the domain first if it can go negative). Intervals
    * with `end <= start` are empty by the half-open semantics and dropped.
    * Output: all point columns then all interval columns (names must not
    * collide). */
  def pointInInterval(points: DataFrame, ptCol: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth=$binWidth must be positive")
    // integer DIV, not double /: epoch-micros magnitudes sit near the edge
    // of double's exact-integer range and a rounded-up quotient would put a
    // boundary point in the wrong bin
    val binned = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("_bin",
        explode(sequence(expr(s"`$startCol` DIV $binWidth"),
          expr(s"(`$endCol` - 1) DIV $binWidth"))))
    val pts = points.withColumn("_bin", expr(s"`$ptCol` DIV $binWidth"))
    pts.join(binned,
        pts("_bin") === binned("_bin") &&
          col(ptCol) >= col(startCol) && col(ptCol) < col(endCol))
      .drop("_bin")
  }
}
