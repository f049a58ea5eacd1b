package graft

import graft.operators.TextStats
import graft.streaming.StreamingCcnetGate
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

// Slow tier (VERDICT r12 #4): excluded from the default `sbt test` run —
// the full tier runs with GRAFT_SLOW_TESTS=1 (round_close.sh does).
@org.scalatest.tags.Slow
class StreamingCcnetGateSpec extends SparkSpec {
  import spark.implicits._

  private val trainDocs = Seq(
    (1L, "en", "the cat sat on the mat and the dog sat on the rug"),
    (2L, "en", "the rat sat on the mat and the cat ran to the dog"),
    (3L, "en", "a cat and a dog and a rat sat on a mat"),
    (4L, "de", "der hund und die katze ist da und der hund ist hier"),
    (5L, "de", "die katze und der hund sind nicht da heute"),
    (6L, "de", "der hund der hund die katze die katze und und"))

  test("streamed ppl is bit-equal to the batch operator; buckets follow the fixed thresholds") {
    implicit val ctx = spark.sqlContext
    val train = trainDocs.toDF("doc_id", "lang", "text")
    val (lm, fm) = StreamingCcnetGate.model(train)
    // thresholds: exact terciles of the train ppl per lang (3 docs each →
    // t1 = min, t2 = middle, computed by rank as in q215)
    val ppl = TextStats.charLmPerplexity(train)
      .select($"doc_id", $"lang", $"ppl").as[(Long, String, Double)].collect()
    val th = ppl.groupBy(_._2).map { case (lang, rows) =>
      val sorted = rows.map(_._3).sorted
      lang -> (sorted(0), sorted(1))
    }
    val t1 = th.map { case (l, (a, _)) => l -> a }
    val t2 = th.map { case (l, (_, b)) => l -> b }

    // batch parity: flagging the training docs reproduces the operator's ppl
    val batch = StreamingCcnetGate.flag(train, lm, fm, t1, t2)
    val pplMap = ppl.map(r => r._1 -> r._3).toMap
    batch.select($"doc_id", $"ppl").as[(Long, Double)].collect()
      .foreach { case (id, p) => assert(p == pplMap(id), s"doc $id") }

    // streamed == batch across waves, including OOV and unmodeled langs
    val streamDocs = trainDocs ++ Seq(
      (10L, "en", "zq xv jw qk unseen trigrams everywhere today"), // OOV → floor path
      (11L, "fr", "le chat est ici avec le chien"))                // no fr model → unmodeled
    val ms = MemoryStream[(Long, String, String)]
    val q = StreamingCcnetGate.flag(
        ms.toDF().toDF("doc_id", "lang", "text"), lm, fm, t1, t2)
      .writeStream.format("memory").queryName("ccnet_gate").outputMode("append")
      .start()
    try {
      streamDocs.grouped(3).foreach { w => ms.addData(w: _*); q.processAllAvailable() }
      val streamed = spark.table("ccnet_gate")
        .as[(Long, String, Long, Option[Double], String)].collect().toSet
      val batchAll = StreamingCcnetGate.flag(
          streamDocs.toDF("doc_id", "lang", "text"), lm, fm, t1, t2)
        .as[(Long, String, Long, Option[Double], String)].collect().toSet
      assert(streamed == batchAll)
      assert(q.lastProgress.stateOperators.isEmpty, "gate must be stateless")
      val byId = streamed.map(r => r._1 -> r).toMap
      // per-lang terciles: min-ppl train doc is head, middle is middle
      val enSorted = trainDocs.filter(_._2 == "en").map(_._1)
        .sortBy(id => (pplMap(id), id))
      assert(byId(enSorted.head)._5 == "head" && byId(enSorted(1))._5 == "middle"
        && byId(enSorted(2))._5 == "tail")
      // the OOV doc scores on the floor path: ppl defined, bucket assigned
      assert(byId(10L)._4.isDefined && Set("head", "middle", "tail")(byId(10L)._5))
      // an unmodeled language emits a null ppl and the 'unmodeled' bucket
      assert(byId(11L)._4.isEmpty && byId(11L)._5 == "unmodeled")
    } finally q.stop()
  }
}
