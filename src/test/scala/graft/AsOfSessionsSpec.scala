package graft

import graft.operators.{AsOf, Sessions}

class AsOfSessionsSpec extends SparkSpec {
  import spark.implicits._

  test("as-of join picks the greatest right ord <= left ord, per key") {
    val left = Seq((1L, "u1", 100L), (2L, "u1", 205L), (3L, "u1", 50L), (4L, "u2", 100L))
      .toDF("id", "key", "ord")
    val right = Seq(("u1", 90L, 9.0), ("u1", 200L, 20.0), ("u2", 150L, 1.0))
      .toDF("key", "ord", "value")
    val out = AsOf.joinAsOf(left, right)
      .as[(Long, String, Long, Long, Double)].collect()
      .map(r => r._1 -> (r._4, r._5)).toMap
    assert(out == Map(
      1L -> ((90L, 9.0)),   // 100 >= 90, not 200
      2L -> ((200L, 20.0))))
    // id 3 (50 < all u1 right ords) and id 4 (100 < 150) have no match
  }

  test("as-of join includes equal-ord matches") {
    val left = Seq((1L, "u", 100L)).toDF("id", "key", "ord")
    val right = Seq(("u", 100L, 7.0)).toDF("key", "ord", "value")
    val out = AsOf.joinAsOf(left, right).as[(Long, String, Long, Long, Double)].collect()
    assert(out.toSeq == Seq((1L, "u", 100L, 100L, 7.0)))
  }

  test("sessionize splits on gaps > threshold and aggregates per session") {
    // u1: events at 0, 10, 2000 (gap>1800 → new session), 2005; u2: single event
    val e = Seq(("u1", 0L), ("u1", 10L), ("u1", 2000L), ("u1", 2005L), ("u2", 42L))
      .toDF("key", "sec")
    val out = Sessions.sessionize(e, gapSec = 1800L)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    assert(out == Map(
      ("u1", 1L) -> ((0L, 10L, 2L)),
      ("u1", 2L) -> ((2000L, 5L, 2L)),
      ("u2", 1L) -> ((42L, 0L, 1L))))
  }

  test("sessionize is deterministic under same-second ties") {
    val e = Seq(("u", 100L), ("u", 100L), ("u", 100L)).toDF("key", "sec")
    val out = Sessions.sessionize(e, gapSec = 10L)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(out.toSeq == Seq(("u", 1L, 100L, 0L, 3L)))
  }
}
