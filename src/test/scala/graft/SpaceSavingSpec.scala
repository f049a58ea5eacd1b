package graft

import graft.functions.SpaceSavingTopK
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

class SpaceSavingSpec extends SparkSpec {
  import spark.implicits._

  private def sketchRows(rows: Seq[Row]): Seq[(String, Long, Long)] =
    rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

  test("capacity >= distinct items: estimates are exact with zero error, any partitioning") {
    val data = Seq.fill(30)("a") ++ Seq.fill(20)("b") ++ Seq.fill(10)("c") ++ Seq("d")
    for (parts <- Seq(1, 4, 16)) {
      val df = data.toDF("item").repartition(parts)
      val out = df.agg(SpaceSavingTopK(col("item"), capacity = 16, k = 4).as("top"))
        .select(explode(col("top")).as("e")).select("e.item", "e.est", "e.err")
        .collect()
      assert(sketchRows(out.toSeq) ==
        Seq(("a", 30L, 0L), ("b", 20L, 0L), ("c", 10L, 0L), ("d", 1L, 0L)),
        s"parts=$parts")
    }
  }

  test("eval ordering is (est desc, item asc) with k truncation") {
    val data = Seq("z", "z", "y", "y", "x")
    val out = data.toDF("item").coalesce(1)
      .agg(SpaceSavingTopK(col("item"), capacity = 8, k = 2).as("top"))
      .select(explode(col("top")).as("e")).select("e.item", "e.est", "e.err")
      .collect()
    assert(sketchRows(out.toSeq) == Seq(("y", 2L, 0L), ("z", 2L, 0L)))
  }

  test("heavy-hitter guarantee holds under eviction and distributed merge") {
    // zipf-ish: item_i appears ~ 2000/i times, plus a long tail of singletons
    val skew = (1 to 40).flatMap(i => Seq.fill(2000 / i)(s"hot_$i"))
    val tail = (1 to 3000).map(i => s"tail_$i")
    val data = new scala.util.Random(7).shuffle(skew ++ tail)
    val n = data.size.toLong
    val capacity = 256
    val truth = data.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    for (parts <- Seq(1, 8)) {
      val out = data.toDF("item").repartition(parts)
        .agg(SpaceSavingTopK(col("item"), capacity, k = capacity).as("top"))
        .select(explode(col("top")).as("e")).select("e.item", "e.est", "e.err")
        .collect()
      val sketch = sketchRows(out.toSeq).map(t => t._1 -> (t._2, t._3)).toMap
      // every item with true count > n/m is present
      val heavy = truth.filter(_._2 > n / capacity).keySet
      assert(heavy.subsetOf(sketch.keySet),
        s"parts=$parts missing: ${heavy -- sketch.keySet}")
      // estimates bracket the truth: c <= est and est - err <= c
      for ((item, (est, err)) <- sketch) {
        val c = truth.getOrElse(item, 0L)
        assert(est >= c, s"parts=$parts $item est=$est < true=$c")
        assert(est - err <= c, s"parts=$parts $item est-err=${est - err} > true=$c")
      }
    }
  }

  test("the aggregate map-side combines: partial sketch before the exchange") {
    // the scale contract: the shuffle carries one m-entry summary per
    // (partition, group), not per-item rows — visible as a partial-mode
    // aggregate below the exchange in the physical plan
    val plan = Seq(("en", "a"), ("de", "b")).toDF("lang", "item")
      .repartition(4)
      .groupBy(col("lang"))
      .agg(SpaceSavingTopK(col("item"), capacity = 8, k = 2).as("top"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.contains("partial_graft_topk_freq"), plan)
  }

  test("nulls are skipped; non-string input is rejected at analysis") {
    val out = Seq(Some("a"), None, Some("a"), None).toDF("item").coalesce(1)
      .agg(SpaceSavingTopK(col("item"), capacity = 4, k = 4).as("top"))
      .select(explode(col("top")).as("e")).select("e.item", "e.est", "e.err")
      .collect()
    assert(sketchRows(out.toSeq) == Seq(("a", 2L, 0L)))
    val err = intercept[Exception] {
      Seq(1L, 2L).toDF("item")
        .agg(SpaceSavingTopK(col("item"), 4, 4).as("top")).collect()
    }
    assert(err.getMessage.contains("graft_topk_freq") ||
      err.getMessage.toLowerCase.contains("string"))
  }
}
