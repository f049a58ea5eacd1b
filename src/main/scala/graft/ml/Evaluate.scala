package graft.ml

import graft.functions.Exprs._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Metric evaluation (SURVEY.md §2.4 A7 accuracy, A13 RMSE) — each a single
  * aggregation expression instead of the reference's dedicated MR jobs
  * (AccuracyMapper/Combiner/Reducer ×2 pipelines).
  */
object Evaluate {

  /** A7: classification accuracy. Input must carry `truth` and `pred` columns.
    * Exact integer-ratio arithmetic → engine-portable. */
  def accuracy(scored: DataFrame): DataFrame =
    scored.agg(
      count(lit(1)).as("n"),
      sum(when(col("truth") === col("pred"), 1L).otherwise(0L)).as("n_correct"))
      .withColumn("accuracy", col("n_correct").cast(DoubleType) / col("n").cast(DoubleType))

  /** A13: RMSE between `actual` and `predicted` columns, grouped by `keys`. */
  def rmse(joined: DataFrame, keys: Seq[String]): DataFrame = {
    val diff = col("predicted") - col("actual")
    val grouped =
      if (keys.isEmpty) joined.agg(count(lit(1)).as("n"), dsum(diff * diff, 10).as("sse"))
      else joined.groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("n"), dsum(diff * diff, 10).as("sse"))
    grouped.withColumn("rmse", sqrt(col("sse") / col("n").cast(DoubleType))).drop("sse")
  }
}
