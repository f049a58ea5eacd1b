package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def points = Seq(
    (1L, 0L), (2L, 99L), (3L, 100L), (4L, 250L), (5L, 999L), (6L, 1000L))
    .toDF("pid", "t")

  private def intervals = Seq(
    (10L, 0L, 100L),     // 1 bin at width 100
    (11L, 50L, 260L),    // spans 3 bins
    (12L, 100L, 100L),   // empty (half-open) — matches nothing
    (13L, 990L, 1001L),  // crosses a bin boundary
    (14L, 300L, 200L))   // end < start — dropped, must not crash sequence()
    .toDF("iid", "t0", "t1")

  /** Ground truth by the direct (nested-loop) predicate. */
  private def naive = points.join(intervals,
    col("t") >= col("t0") && col("t") < col("t1"))
    .select(col("pid"), col("iid"))

  test("binned range join equals the naive non-equi join, with no duplicates") {
    for (binWidth <- Seq(1L, 7L, 100L, 1000L, 5000L)) {
      val out = RangeJoin.pointInInterval(points, "t", intervals, "t0", "t1", binWidth)
        .select(col("pid"), col("iid"))
      val got = out.as[(Long, Long)].collect().toSeq
      val want = naive.as[(Long, Long)].collect().toSeq
      assert(got.sorted == want.sorted, s"binWidth=$binWidth")
      assert(got.size == got.distinct.size, s"duplicate pairs at binWidth=$binWidth")
    }
  }

  test("half-open semantics: start inclusive, end exclusive") {
    val out = RangeJoin.pointInInterval(points, "t", intervals, "t0", "t1", 100L)
      .select(col("pid"), col("iid")).as[(Long, Long)].collect().toSet
    assert(out.contains((1L, 10L)))   // t=0 == start → included
    assert(!out.contains((3L, 10L)))  // t=100 == end → excluded
    assert(out.contains((3L, 11L)))   // 100 ∈ [50, 260)
    assert(!out.exists(_._2 == 12L))  // empty interval
    assert(!out.exists(_._2 == 14L))  // inverted interval dropped
    assert(out.contains((5L, 13L)) && out.contains((6L, 13L))) // 999 and 1000 ∈ [990, 1001)
  }

  test("fuzz: random intervals/points equal the naive join at random bin widths") {
    val rnd = new scala.util.Random(23)
    for (round <- 1 to 3) {
      val pts = (1 to 300).map(i => (i.toLong, rnd.nextInt(10000).toLong)).toDF("pid", "t")
      val ivs = (1 to 120).map { i =>
        val s = rnd.nextInt(10000).toLong
        (i.toLong, s, s + rnd.nextInt(500).toLong) // includes empty (len 0)
      }.toDF("iid", "t0", "t1")
      val binWidth = 1L + rnd.nextInt(700)
      val got = RangeJoin.pointInInterval(pts, "t", ivs, "t0", "t1", binWidth)
        .select(col("pid"), col("iid")).as[(Long, Long)].collect().toSeq.sorted
      val want = pts.join(ivs, col("t") >= col("t0") && col("t") < col("t1"))
        .select(col("pid"), col("iid")).as[(Long, Long)].collect().toSeq.sorted
      assert(got == want, s"round=$round binWidth=$binWidth")
    }
  }

  test("the plan is an equi join on the bin, not a nested loop") {
    val out = RangeJoin.pointInInterval(points, "t", intervals, "t0", "t1", 100L)
    val physical = out.queryExecution.executedPlan.toString
    assert(!physical.contains("BroadcastNestedLoopJoin"), physical)
    assert(!physical.contains("CartesianProduct"), physical)
  }
}
