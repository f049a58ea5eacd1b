package graft

import graft.ml.RandomProjection
import org.apache.spark.sql.functions._

/** JL random projection (q130): distance preservation on real embedding
  * pairs, derived-sign determinism, and the fan-out-collapse plan shape. */
class RandomProjectionSpec extends SparkSpec {
  import spark.implicits._

  private def emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))

  test("projected squared distances concentrate around the originals") {
    val proj = RandomProjection.project(emb, kDim = 16, d = 64)
      .groupBy(col("vec_id"))
      .agg(array_sort(collect_list(struct(col("k"), col("p")))).as("e"))
      .select(col("vec_id"), expr("transform(e, x -> x.p)").as("pv"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val orig = emb.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    def d2(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ids = orig.keys.toSeq.sorted.take(40)
    val ratios = for {
      a <- ids; b <- ids if a < b
      od = d2(orig(a), orig(b)) if od > 0
    } yield d2(proj(a), proj(b)) / od
    val sorted = ratios.sorted
    val median = sorted(sorted.size / 2)
    // K=16 → stderr ≈ sqrt(2/16) ≈ 35%: the median must sit near 1 and
    // the bulk inside a 3σ-ish band (measured: median ≈ 1, >90% in band)
    assert(median > 0.6 && median < 1.6, s"median distortion $median")
    val inBand = ratios.count(r => r > 0.25 && r < 3.0).toDouble / ratios.size
    assert(inBand > 0.8, s"only ${inBand * 100}%% of pairs within [0.25, 3]")
  }

  test("the derived sign matrix is deterministic and balanced-ish") {
    val s1 = RandomProjection.signs(spark, 16, 64).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val s2 = RandomProjection.signs(spark, 16, 64).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(s1 == s2)
    assert(s1.values.forall(v => v == 1.0 || v == -1.0))
    val plus = s1.values.count(_ == 1.0).toDouble / s1.size
    assert(plus > 0.4 && plus < 0.6, s"sign balance $plus")
  }

  test("projection plan broadcasts the sign matrix and partial-aggregates") {
    val phys = RandomProjection.project(emb, kDim = 16, d = 64)
      .queryExecution.executedPlan.toString
    assert(phys.contains("BroadcastExchange") || phys.contains("BroadcastHashJoin"),
      phys.take(2000))
    assert(phys.contains("partial"), phys.take(2000)) // map-side collapse
  }
}
