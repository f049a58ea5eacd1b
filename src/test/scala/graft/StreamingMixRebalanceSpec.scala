package graft

import graft.streaming.StreamingMixRebalance
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

case class MixEvent(ts: Timestamp, source: String, doc_id: Long)

/** Batch-parity for the streaming mixture rebalance: per-epoch rates
  * emitted at watermark close must equal the batch computation on the same
  * static frame, and the stateless coin must reproduce the exact q98
  * keep/drop set (verified against an independent Scala-side md5). */
class StreamingMixRebalanceSpec extends SparkSpec {
  import spark.implicits._

  private def t(min: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")

  // epoch 1 [00:00, 00:10): web×6, books×2 → min=2, rates: web 333333, books 1000000
  // epoch 2 [00:10, 00:20): web×3, books×3, code×1 → min=1, rates: 333333/333333/1000000
  private val events =
    (1L to 6L).map(i => MixEvent(t(1), "web", i)) ++
      Seq(MixEvent(t(2), "books", 10L), MixEvent(t(3), "books", 11L)) ++
      (20L to 22L).map(i => MixEvent(t(11), "web", i)) ++
      (30L to 32L).map(i => MixEvent(t(12), "books", i)) ++
      Seq(MixEvent(t(13), "code", 40L))

  private def staticFrame = events.toDF()

  test("per-epoch rates at watermark close equal the batch computation") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[MixEvent]
    val out = collection.mutable.ArrayBuffer[(Timestamp, String, Long, Long)]()
    val q = StreamingMixRebalance.epochRates(ms.toDF(), "10 minutes", "5 minutes")
      .writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        out.synchronized {
          out ++= df.select("epoch_start", "source", "n_docs", "rate_ppm")
            .as[(Timestamp, String, Long, Long)].collect()
        }
        ()
      }.start()
    try {
      ms.addData(events)
      q.processAllAvailable()
      // sentinel far past both epochs: advances the watermark so they close
      ms.addData(Seq(MixEvent(t(59), "sentinel", 999L)))
      q.processAllAvailable()
    } finally q.stop()
    val batch = StreamingMixRebalance.epochRates(staticFrame, "10 minutes", "5 minutes")
      .select("epoch_start", "source", "n_docs", "rate_ppm")
      .as[(Timestamp, String, Long, Long)].collect().toSet
      .filter(_._2 != "sentinel")
    assert(out.toSet == batch,
      s"stream=${out.toSet.toSeq.sorted.mkString(",")} batch=${batch.toSeq.sorted.mkString(",")}")
    // and the rates themselves are the q98 integer rule
    val e1 = out.filter(_._1 == t(0)).map(r => r._2 -> r._4).toMap
    assert(e1 == Map("web" -> 333333L, "books" -> 1000000L), s"epoch-1 rates: $e1")
  }

  test("applyRates reproduces the exact q98 hash-coin keep set per epoch") {
    val rates = StreamingMixRebalance.epochRates(staticFrame, "10 minutes", "5 minutes")
    val sampled = StreamingMixRebalance.applyRates(
        StreamingMixRebalance.withEpoch(staticFrame, "10 minutes"), rates)
      .select("doc_id").as[Long].collect().toSet
    // independent replay of the coin: md5-60("mix:" + id) % 1e6 < rate
    def h60(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val epochOf = events.map(e => e.doc_id -> (e.ts.getTime / 600000L)).toMap
    val counts = events.groupBy(e => (epochOf(e.doc_id), e.source)).view.mapValues(_.size.toLong).toMap
    val mins = counts.groupBy(_._1._1).view.mapValues(_.values.min).toMap
    val expected = events.filter { e =>
      val k = (epochOf(e.doc_id), e.source)
      val rate = math.min(1000000L, 1000000L * mins(k._1) / counts(k))
      h60(s"mix:${e.doc_id}") % 1000000L < rate
    }.map(_.doc_id).toSet
    assert(sampled == expected, s"sampled=$sampled expected=$expected")
    assert(expected.nonEmpty && expected.size < events.size,
      "fixture should exercise both kept and dropped rows")
  }
}
