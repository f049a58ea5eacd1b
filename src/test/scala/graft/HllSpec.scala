package graft

import graft.operators.Hll
import org.apache.spark.sql.functions._

/** Portable HyperLogLog (q129): error within the theoretical band,
  * register mergeability (max of maxes), small-range correction branch. */
class HllSpec extends SparkSpec {
  import spark.implicits._

  test("estimate lands within the ~1.04/sqrt(m) error band on 5000 distinct keys") {
    val df = (1 to 5000).map(i => ("g", s"user$i")).toDF("g", "key")
    val est = Hll.estimate(Hll.registers(df, Seq("g"), "key"), Seq("g"))
      .collect().head.getDouble(2)
    // m=64 → standard error ≈ 13%; allow 3σ
    assert(math.abs(est - 5000) / 5000.0 < 0.39, s"estimate $est too far from 5000")
  }

  test("registers merge by max: union of shards equals whole") {
    val a = (1 to 700).map(i => ("g", s"k$i")).toDF("g", "key")
    val b = (500 to 1200).map(i => ("g", s"k$i")).toDF("g", "key")
    val whole = Hll.registers(a.union(b), Seq("g"), "key")
      .collect().map(r => r.getLong(1) -> r.getInt(2)).toMap
    val merged = Hll.registers(a, Seq("g"), "key")
      .union(Hll.registers(b, Seq("g"), "key"))
      .groupBy(col("g"), col("bucket")).agg(max(col("r")).as("r"))
      .collect().map(r => r.getLong(1) -> r.getInt(2)).toMap
    assert(whole == merged)
  }

  test("small-range correction: a handful of keys estimates near-exactly") {
    val df = (1 to 10).map(i => ("g", s"only$i")).toDF("g", "key")
    val est = Hll.estimate(Hll.registers(df, Seq("g"), "key"), Seq("g"))
      .collect().head.getDouble(2)
    // linear counting regime: m·ln(m/zeros) is near-exact when n ≪ m
    assert(math.abs(est - 10) < 2.0, s"small-range estimate $est should be ~10")
  }

  test("duplicates do not move the registers (distinct-count semantics)") {
    val once = (1 to 100).map(i => ("g", s"k$i")).toDF("g", "key")
    val thrice = once.union(once).union(once)
    val r1 = Hll.estimate(Hll.registers(once, Seq("g"), "key"), Seq("g"))
      .collect().head.getDouble(2)
    val r3 = Hll.estimate(Hll.registers(thrice, Seq("g"), "key"), Seq("g"))
      .collect().head.getDouble(2)
    assert(r1 == r3)
  }
}
