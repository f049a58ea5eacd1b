package graft

import graft.operators.CountMin
import org.apache.spark.sql.functions._

/** Count–Min sketch (q128): overestimate guarantee, collision-free
  * exactness, mergeability (the property that makes it shard- and
  * stream-friendly), and zero-for-unseen semantics. */
class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private val keyed = Seq(
    ("alpha", 100L), ("beta", 50L), ("gamma", 25L), ("delta", 10L),
    ("epsilon", 5L), ("zeta", 2L), ("eta", 1L), ("theta", 1L)
  ).toDF("key", "cnt")

  test("estimates are never below the true count; wide sketch is exact") {
    // width 2048 over 8 keys: the birthday bound makes per-row collisions
    // unlikely, and the MIN over 4 independent rows removes any that occur
    val sk = CountMin.build(keyed, depth = 4, width = 2048)
    val est = CountMin.estimate(keyed.select(col("key")), sk, depth = 4, width = 2048)
      .join(keyed, "key")
    assert(est.filter(col("est") < col("cnt")).count() == 0)
    assert(est.filter(col("est") =!= col("cnt")).count() == 0, "wide sketch should be exact")
  }

  test("narrow sketch still never underestimates (collisions only add)") {
    val sk = CountMin.build(keyed, depth = 2, width = 4)
    val est = CountMin.estimate(keyed.select(col("key")), sk, depth = 2, width = 4)
      .join(keyed, "key")
    assert(est.filter(col("est") < col("cnt")).count() == 0)
  }

  test("sketch of a union equals the summed per-shard sketches") {
    val a = keyed.filter(col("cnt") >= 10L)
    val b = keyed.filter(col("cnt") < 10L)
    val whole = CountMin.build(keyed, depth = 4, width = 64)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val merged = CountMin.build(a, depth = 4, width = 64)
      .union(CountMin.build(b, depth = 4, width = 64))
      .groupBy(col("j"), col("cell")).agg(sum(col("c")).as("c"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(whole == merged)
  }

  test("a key the sketch never saw estimates 0 only if its cells are clean") {
    val sk = CountMin.build(keyed, depth = 4, width = 2048)
    val est = CountMin.estimate(Seq("never-seen-key-xyz").toDF("key"), sk,
        depth = 4, width = 2048)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // with 8 keys in 2048 cells the probe's 4 cells are almost surely
    // untouched; if a collision ever lands here the estimate may be > 0
    // but NEVER negative — assert the guarantee, record the value
    assert(est.head._2 >= 0L)
  }
}
