package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-prior) join — an operator Spark lacks natively,
  * composed from a union + running `last(ignoreNulls)` window instead of a
  * custom SparkPlan (SURVEY.md preference order (a): compose existing ops).
  *
  * Semantics match DuckDB's `ASOF JOIN … ON l.key = r.key AND l.ord >= r.ord`:
  * each left row matches the right row with the greatest ord ≤ its own.
  * Cost: one shuffle on the key (same as the equivalent equi-join) plus a
  * per-key ordered window — no point-in-time self-join blowup, scales as
  * sort-merge over (key, ord).
  *
  * Right rows must be unique per (key, ord) — pre-aggregate duplicates.
  * Determinism: left rows are value-transparent in the window (their value
  * slot is null and `last` ignores nulls), so tie order among same-ord left
  * rows cannot affect results.
  */
object AsOf {

  /** left: (id, key, ord, …ignored); right: (key, ord, value).
    * Output: (id, key, ord, matched_ord, matched_value) — inner semantics
    * (rows with no prior right match are dropped). */
  def joinAsOf(left: DataFrame, right: DataFrame): DataFrame = {
    val valueType = right.schema("value").dataType
    val idType = left.schema("id").dataType
    val ordType = left.schema("ord").dataType
    val l = left.select(col("id"), col("key"), col("ord"),
      lit(null).cast(ordType).as("_r_ord"), lit(null).cast(valueType).as("_r_value"),
      lit(1).as("_side"))
    val r = right.select(lit(null).cast(idType).as("id"), col("key"), col("ord"),
      col("ord").as("_r_ord"), col("value").as("_r_value"), lit(0).as("_side"))
    // right rows sort before left rows at equal ord → ord-equal matches included
    val w = Window.partitionBy(col("key")).orderBy(col("ord").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("matched_ord", last(col("_r_ord"), ignoreNulls = true).over(w))
      .withColumn("matched_value", last(col("_r_value"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1 && col("matched_value").isNotNull)
      .select(col("id"), col("key"), col("ord"), col("matched_ord"), col("matched_value"))
  }
}
