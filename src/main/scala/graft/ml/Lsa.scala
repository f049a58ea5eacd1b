package graft.ml

import graft.functions.Exprs._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Latent semantic analysis primitive: the top singular direction of a
  * sparse matrix (doc_id, term, w) — classically, the first LSA "topic" of
  * the TF-IDF matrix — by power iteration on AᵀA, as pure DataFrame
  * dataflow. This adds the matrix-factorization family to the engine's
  * iterative loops (PageRank: vertex fixpoint; k-means: centroid fixpoint;
  * GD: weight fixpoint; here: eigenvector fixpoint).
  *
  * Engine-portable determinism, the standing ladder: every product is
  * rounded to 12 dp before the exact DECIMAL(30,12) accumulator, every
  * summed result re-rounded to 12 dp, the norm's `sqrt` to 10 dp (the
  * libm precedent), and the normalized vector to 12 dp — each iteration is
  * bit-identical across engines and partitionings, so q103 unrolls the
  * whole optimization as CTEs. Sign is pinned by Perron-Frobenius: TF-IDF
  * weights and the all-ones start are non-negative, so iterates stay
  * non-negative (no sign-flip ambiguity).
  *
  * Scale: per round two equi-shuffle join+sum passes over the cell table
  * (A v by term, Aᵀ u by doc) and one 1-row norm broadcast — the vector
  * frames are vocab-/corpus-keyed and are NEVER broadcast or collected,
  * so nothing bounds the matrix size but the shuffle. The cell table is
  * cached across rounds; vectors are eagerly checkpointed so the loop
  * plan stays flat.
  */
object Lsa {

  /** cells: (doc_id, term, w), w ≥ 0. Returns (term, weight): the
    * unit-norm top right-singular vector, rounded to 8 dp. */
  def topSingular(cells: DataFrame, iterations: Int): DataFrame = {
    require(iterations >= 1, s"Lsa.topSingular iterations must be >= 1, got $iterations")
    val c = cells.select(col("doc_id"), col("term"), col("w"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var v = c.select(col("term")).distinct()
      .withColumn("v", lit(1.0d)).localCheckpoint(eager = true)
    for (_ <- 1 to iterations) {
      val u = c.join(v, "term")
        .groupBy(col("doc_id"))
        .agg(round(dsum(round(col("w") * col("v"), 12), 12), 12).as("u"))
      val vv = c.join(u, "doc_id")
        .groupBy(col("term"))
        .agg(round(dsum(round(col("w") * col("u"), 12), 12), 12).as("vv"))
      val nm = vv.agg(round(sqrt(dsum(round(col("vv") * col("vv"), 12), 12)), 10).as("nm"))
      v = vv.crossJoin(broadcast(nm))
        .select(col("term"), round(col("vv") / col("nm"), 12).as("v"))
        .localCheckpoint(eager = true)
    }
    c.unpersist(blocking = false)
    v.select(col("term"), round(col("v"), 8).as("weight"))
  }
}
