package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Skew-mitigation utilities for hot join keys at cluster scale.
  *
  * AQE's skew-join splitting handles most cases at runtime; explicit salting
  * remains the tool when one build-side key is so hot that even a split
  * partition overwhelms a task (the classic power-law join). The salt is
  * derived deterministically from other columns — no rand(), so plans stay
  * reproducible and re-executable (speculative tasks, stage retries).
  */
object Skew {

  /** Equi-join `left ⋈ right` on `key`, with the left side's rows spread
    * over `salts` sub-keys and the right side replicated `salts` times.
    * Semantics identical to `left.join(right, key)` (inner); cost trades a
    * `salts`× replication of the (small) right side for an even spread of
    * the hot key's rows across tasks. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, salts: Int): DataFrame = {
    val salted = left.withColumn("_salt",
      pmod(xxhash64(left.columns.map(col).toIndexedSeq: _*), lit(salts.toLong)))
    val replicated = right.crossJoin(
      right.sparkSession.range(salts).select(col("id").cast(LongType).as("_salt")))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-phase (salted partial → final) count for a heavily skewed group key.
    * Spark's hash aggregate already partial-aggregates map-side; this form
    * additionally randomizes the *shuffle* key so one hot group's partials
    * spread over `salts` reducers before the cheap final combine. */
  def saltedGroupCount(df: DataFrame, key: String, salts: Int): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(salts.toLong)))
    salted.groupBy(col(key), col("_salt")).agg(count(lit(1)).as("_partial"))
      .groupBy(col(key)).agg(sum(col("_partial")).as("cnt"))
  }
}
