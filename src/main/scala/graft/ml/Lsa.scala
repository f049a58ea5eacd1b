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
    val v = iterate(c, iterations, deflate = None)
    c.unpersist(blocking = false)
    v.select(col("term"), round(col("v"), 8).as("weight"))
  }

  /** Second right-singular direction by deflation: power iteration on
    * AᵀA − λ₁v₁v₁ᵀ, where v₁ is the phase-1 iterate and λ₁ = ‖Av₁‖² its
    * Rayleigh eigenvalue estimate. The deflation term is applied per round
    * as t′ = t − round(λ₁·(v₁·s), 12)·v₁ — one extra 1-row dot-product
    * broadcast and one vocab-keyed equi-join per round on top of the
    * phase-1 loop shape; still nothing vector-sized is collected or
    * broadcast. Sign is NOT canonicalized: the all-ones start plus the
    * bit-portable ladder make the signed iterate identical in any engine,
    * which is exactly what the unrolled oracle replays.
    *
    * This is the top-k extension path stated on q103: each further
    * component is another deflation term in the same loop. */
  def secondSingular(cells: DataFrame, iterations: Int): DataFrame = {
    require(iterations >= 1, s"Lsa.secondSingular iterations must be >= 1, got $iterations")
    val c = cells.select(col("doc_id"), col("term"), col("w"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val v1 = iterate(c, iterations, deflate = None)
    val u1 = c.join(v1, "term")
      .groupBy(col("doc_id"))
      .agg(round(dsum(round(col("w") * col("v"), 12), 12), 12).as("u"))
    val lam = u1.agg(round(dsum(round(col("u") * col("u"), 12), 12), 12).as("lam"))
      .localCheckpoint(eager = true)
    val v2 = iterate(c, iterations, deflate = Some((v1, lam)))
    c.unpersist(blocking = false)
    v2.select(col("term"), round(col("v"), 8).as("weight"))
  }

  /** The shared power-iteration loop at full 12-dp precision: starts from
    * all-ones, applies `iterations` rounds of v ← normalize((AᵀA)v − defl),
    * where defl (when present) subtracts λ₁(v₁·v)v₁ with the same rounding
    * ladder the oracle unrolls. Returns (term, v). */
  private def iterate(c: DataFrame, iterations: Int,
                      deflate: Option[(DataFrame, DataFrame)]): DataFrame = {
    var v = c.select(col("term")).distinct()
      .withColumn("v", lit(1.0d)).localCheckpoint(eager = true)
    for (_ <- 1 to iterations) {
      val u = c.join(v, "term")
        .groupBy(col("doc_id"))
        .agg(round(dsum(round(col("w") * col("v"), 12), 12), 12).as("u"))
      val raw = c.join(u, "doc_id")
        .groupBy(col("term"))
        .agg(round(dsum(round(col("w") * col("u"), 12), 12), 12).as("vv"))
      val vv = deflate match {
        case None => raw
        case Some((v1, lam)) =>
          val dot = v1.select(col("term"), col("v").as("v1"))
            .join(v.select(col("term"), col("v").as("s")), "term")
            .agg(round(dsum(round(col("v1") * col("s"), 12), 12), 12).as("dot"))
          val coef = dot.crossJoin(broadcast(lam))
            .select(round(col("lam") * col("dot"), 12).as("coef"))
          raw.join(v1.select(col("term"), col("v").as("v1")), "term")
            .crossJoin(broadcast(coef))
            .select(col("term"),
              round(col("vv") - round(col("coef") * col("v1"), 12), 12).as("vv"))
      }
      val nm = vv.agg(round(sqrt(dsum(round(col("vv") * col("vv"), 12), 12)), 10).as("nm"))
      v = vv.crossJoin(broadcast(nm))
        .select(col("term"), round(col("vv") / col("nm"), 12).as("v"))
        .localCheckpoint(eager = true)
    }
    v
  }
}
