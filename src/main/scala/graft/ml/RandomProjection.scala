package graft.ml

import graft.functions.Exprs
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss random projection (Achlioptas 2003's ±1 variant):
  * project d-dim embeddings onto kDim pseudo-random ±1 directions,
  * p_k = (Σ_i v_i·s_{k,i}) / √kDim — pairwise distances are preserved in
  * expectation, at kDim/d the storage and downstream compute. The
  * dimensionality-reduction front end an embedding pipeline runs before
  * clustering/ANN when even PQ codes are too wide to train on.
  *
  * The sign matrix is DERIVED, not stored: s_{k,i} = ±1 from the parity of
  * [[Exprs.h60]]("rp:k:i") — any engine (and any shard, with no
  * coordination) regenerates the identical matrix, which is what makes
  * the q130 oracle a full hash-match and the operator embarrassingly
  * mergeable. The projection sums go through the exact DECIMAL(30,12)
  * ladder, so they are partial-aggregation-order-independent: the n·d
  * explode fans out ×kDim against the broadcast (kDim·d)-row sign matrix
  * but collapses map-side to kDim partials per vector before the exchange
  * — the shuffle carries n·kDim rows, never n·d·kDim. */
object RandomProjection {

  /** The (k, i, s) ±1 sign matrix — kDim·d rows, a plan-time constant. */
  def signs(spark: SparkSession, kDim: Int, d: Int): DataFrame = {
    import spark.implicits._
    (for { k <- 0 until kDim; i <- 0 until d } yield (k, i)).toDF("k", "i")
      .select(col("k"), col("i"),
        when(pmod(Exprs.h60(concat(lit("rp:"), col("k").cast("string"),
          lit(":"), col("i").cast("string"))), lit(2L)) === 0L, lit(1.0d))
          .otherwise(lit(-1.0d)).as("s"))
  }

  /** emb: (vec_id, vec: array<double>) → long-format (vec_id, k, p),
    * p rounded to 8 dp. */
  def project(emb: DataFrame, kDim: Int, d: Int): DataFrame = {
    require(kDim >= 1, s"RandomProjection kDim must be >= 1, got $kDim")
    val sgn = signs(emb.sparkSession, kDim, d)
    emb.select(col("vec_id"), posexplode(col("vec")).as(Seq("i", "x")))
      .join(broadcast(sgn), "i")
      .groupBy(col("vec_id"), col("k").cast("long").as("k"))
      .agg(round(Exprs.dsum(col("x") * col("s"), 12) /
        sqrt(lit(kDim.toDouble)), 8).as("p"))
  }
}
