package graft.ml

import graft.functions.Exprs._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** kNN classifier (SURVEY.md §2.3 J3 + §2.5 T2 + §2.4 A8): broadcast
  * cross-join similarity kernel → per-query top-k → majority vote.
  *
  * The reference loads the whole train matrix into every task's heap
  * (KNNMapper.java:52-74) and hand-maintains a k-best array (:147-159).
  * Here the train side is an explicit `broadcast` (Spark plans a
  * BroadcastNestedLoopJoin — the same replicated-join shape, but spillable
  * and columnar), and top-k is a rank window partitioned by query.
  *
  * Scale path: for train sets beyond broadcast size, swap the kernel for the
  * LSH-bucketed candidate join in [[graft.operators.Similarity]] — same
  * downstream top-k/vote plan.
  *
  * Similarities are rounded to 6 dp *before* ranking so that rank order (and
  * therefore the result set) is identical across engines and run-to-run; ties
  * break on neighbor id.
  */
object Knn {

  /** Top-k neighbors of each test row among train rows by cosine similarity
    * over double-array `vec` columns. Output: (q_id, n_id, n_label, sim, rk). */
  def neighbors(test: DataFrame, train: DataFrame, k: Int): DataFrame = {
    val t = test.select(col("id").as("q_id"), col("vec").as("q_vec"))
    val tr = train.select(col("id").as("n_id"), col("label").as("n_label"), col("vec").as("n_vec"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id").asc)
    t.crossJoin(broadcast(tr))
      .withColumn("sim", round(cosine(col("q_vec"), col("n_vec")), 6))
      .withColumn("rk", row_number().over(w).cast(LongType))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("n_id"), col("n_label"), col("sim"), col("rk"))
  }

  /** Top-k neighbors over sparse MapType(idx → weight) feature columns — the
    * reference's own vector representation (KNNMapper.java:20). Same plan
    * shape as [[neighbors]], kernel swapped for [[mapCosine]]. */
  def neighborsSparse(test: DataFrame, train: DataFrame, k: Int): DataFrame = {
    val t = test.select(col("id").as("q_id"), col("features").as("q_f"))
    val tr = train.select(col("id").as("n_id"), col("label").as("n_label"), col("features").as("n_f"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id").asc)
    t.crossJoin(broadcast(tr))
      .withColumn("sim", round(mapCosine(col("q_f"), col("n_f")), 6))
      .withColumn("rk", row_number().over(w).cast(LongType))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("n_id"), col("n_label"), col("sim"), col("rk"))
  }

  private def vote(nbrs: DataFrame): DataFrame = {
    val votes = nbrs.groupBy(col("q_id"), col("n_label")).agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("votes").desc, col("n_label").asc)
    votes.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("q_id"), col("n_label").as("pred"))
  }

  /** Majority vote over the k neighbors (A8): most votes, then highest total
    * similarity is *not* used (the reference votes by count only,
    * KNNMapper.java:161-184) — ties break on smallest label. */
  def classify(test: DataFrame, train: DataFrame, k: Int): DataFrame =
    vote(neighbors(test, train, k))

  /** [[classify]] over sparse MapType feature vectors. */
  def classifySparse(test: DataFrame, train: DataFrame, k: Int): DataFrame =
    vote(neighborsSparse(test, train, k))
}
