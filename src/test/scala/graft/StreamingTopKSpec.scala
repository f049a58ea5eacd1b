package graft

import graft.streaming.StreamingTopK
import graft.streaming.StreamingTopK.{KeyedItem, TopEntry}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamingTopKSpec extends SparkSpec {
  import spark.implicits._

  /** Drive `waves` of keyed items through the stateful sketch; return each
    * key's FINAL emitted top-k snapshot (update mode re-emits a touched
    * key's full current top-k per batch, so overwriting the key's whole
    * snapshot per emission yields exactly the final state). */
  private def run(waves: Seq[Seq[KeyedItem]], capacity: Int, k: Int): Map[(String, String), (Long, Long)] = {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[KeyedItem]
    val snapshots = scala.collection.mutable.Map[String, Map[String, (Long, Long)]]()
    val q = StreamingTopK.topkFreq(ms.toDS(), capacity, k)
      .writeStream.outputMode("update")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[TopEntry], _: Long) =>
        df.collect().groupBy(_.key).foreach { case (key, rs) =>
          snapshots.synchronized {
            snapshots(key) = rs.map(r => r.item -> ((r.est, r.err))).toMap
          }
        }
      }.start()
    try {
      waves.foreach { w => ms.addData(w); q.processAllAvailable() }
    } finally q.stop()
    snapshots.toMap.flatMap { case (key, m) =>
      m.map { case (item, v) => (key, item) -> v }
    }
  }

  test("exact mode: final estimates equal true counts across micro-batch boundaries") {
    val waves = Seq(
      Seq.fill(5)(KeyedItem("en", "a")) ++ Seq(KeyedItem("en", "b"), KeyedItem("de", "x")),
      Seq.fill(3)(KeyedItem("en", "a")) ++ Seq(KeyedItem("en", "c"), KeyedItem("de", "x")),
      Seq(KeyedItem("en", "b")))
    val out = run(waves, capacity = 8, k = 8)
    assert(out(("en", "a")) == ((8L, 0L)))
    assert(out(("en", "b")) == ((2L, 0L)))
    assert(out(("en", "c")) == ((1L, 0L)))
    assert(out(("de", "x")) == ((2L, 0L)))
  }

  test("heavy-hitter guarantee survives eviction across batches") {
    // skewed stream: hot items heavily repeated, a tail forcing evictions,
    // split into 4 arrival waves
    val rnd = new scala.util.Random(11)
    val hot = (1 to 8).flatMap(i => Seq.fill(120 / i)(s"hot_$i"))
    val tail = (1 to 400).map(i => s"tail_$i")
    val data = rnd.shuffle(hot ++ tail).map(item => KeyedItem("k", item))
    val n = data.size.toLong
    val capacity = 64
    val truth = data.groupBy(_.item).map { case (i, v) => i -> v.size.toLong }
    val out = run(data.grouped((data.size + 3) / 4).toSeq, capacity, k = capacity)
    val sketch = out.collect { case (("k", item), v) => item -> v }.toMap
    val heavy = truth.filter(_._2 > n / capacity).keySet
    assert(heavy.nonEmpty && heavy.subsetOf(sketch.keySet),
      s"missing: ${heavy -- sketch.keySet}")
    for ((item, (est, err)) <- sketch) {
      val c = truth.getOrElse(item, 0L)
      assert(est >= c, s"$item est=$est < true=$c")
      assert(est - err <= c, s"$item est-err=${est - err} > true=$c")
    }
  }
}
