package graft

import graft.operators.Kmv
import org.apache.spark.sql.functions._

/** KMV theta-sketch set operations (operators.Kmv): exact mode below k,
  * estimator tolerance above it, and the membership-sample intersection. */
class KmvSpec extends SparkSpec {
  import spark.implicits._

  /** Items frame from two id sets via the engine's md5 ladder. */
  private def items(a: Seq[Long], b: Seq[Long]) = {
    val df = (a.map(("a", _)) ++ b.map(("b", _))).toDF("s", "id")
    df.groupBy(conv(substring(md5(concat(lit("t:"), col("id").cast("string"))), 1, 12), 16, 10)
        .cast("long").as("h"))
      .agg(bool_or(col("s") === "a").as("ina"), bool_or(col("s") === "b").as("inb"))
  }

  test("sub-k sets report exact cardinalities in estimate columns") {
    val out = Kmv.setOps(items(1L to 30L, 20L to 40L), k = 64)
      .collect().head
    assert(out.getAs[Long]("exact_a") == 30L)
    assert(out.getAs[Long]("exact_b") == 21L)
    assert(out.getAs[Long]("exact_union") == 40L)
    assert(out.getAs[Long]("exact_inter") == 11L)
    assert(out.getAs[Double]("est_a") == 30.0)
    assert(out.getAs[Double]("est_b") == 21.0)
    assert(out.getAs[Double]("est_union") == 40.0)
    assert(out.getAs[Double]("est_inter") == 11.0)
  }

  test("estimator mode holds a 3/sqrt(k) relative-error contract") {
    // 5000 ∪ 5000 with 2000 overlap, k = 256 → σ ≈ 1/16; allow 3σ
    val a = 1L to 5000L
    val b = 3001L to 8000L
    val out = Kmv.setOps(items(a, b), k = 256).collect().head
    val tol = 3.0 / math.sqrt(256.0)
    def rel(est: Double, exact: Double) = math.abs(est - exact) / exact
    assert(rel(out.getAs[Double]("est_a"), 5000.0) < tol, out.toString)
    assert(rel(out.getAs[Double]("est_b"), 5000.0) < tol, out.toString)
    assert(rel(out.getAs[Double]("est_union"), 8000.0) < tol, out.toString)
    // intersection compounds union error with sampling error — 2× slack
    assert(rel(out.getAs[Double]("est_inter"), 2000.0) < 2 * tol, out.toString)
  }

  test("estimates are invariant to partitioning (bounded-heap merge)") {
    val base = items(1L to 2000L, 1000L to 3000L)
    val one = Kmv.setOps(base.repartition(1), k = 128).collect().head.toSeq
    val many = Kmv.setOps(base.repartition(13), k = 128).collect().head.toSeq
    assert(one == many)
  }

  test("k of 1 or less is refused") {
    intercept[IllegalArgumentException](Kmv.setOps(items(Seq(1L), Seq(2L)), k = 1))
  }
}
