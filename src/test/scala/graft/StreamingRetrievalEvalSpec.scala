package graft

import graft.ml.Pq
import graft.streaming.{StreamingPqIngest, StreamingRetrievalEval}
import graft.streaming.StreamingPqIngest.VecRow
import graft.streaming.StreamingRetrievalEval.{CodeVec, EpochTopK}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming recall gate ≡ the batch retrieval-eval card on the same
  * fixtures (VERDICT r11 stretch #7 — the last batch/stream asymmetry in
  * the ANN story): as vectors stream into the PQ index, the per-epoch ADC
  * top-k snapshots and the per-epoch recall/MRR/hit@1 card must equal what
  * the batch operators (Pq.adcTopK against a static bruteL2TopK truth
  * snapshot) compute over exactly the rows ingested so far — at EVERY
  * epoch, not just after catch-up, and under redelivery. */
class StreamingRetrievalEvalSpec extends SparkSpec {
  import spark.implicits._

  private val m = 4
  private val kc = 4
  private val k = 5
  private val nPanel = 4L

  // the PqIngest fixture: three separated 8-dim blobs, 36 vectors
  private lazy val vecs: Seq[VecRow] = (0L until 36L).map { i =>
    val blob = i % 3
    VecRow(i, (0 until 8).map(p =>
      blob * 10.0 + ((i * 7 + p * 13) % 17) * 0.25 + p * 0.1))
  }
  private lazy val emb = vecs.map(v => (v.vecId, v.vec)).toDF("vec_id", "vec")
  private lazy val waves = vecs.grouped(12).toSeq

  // plain-PQ index models (the q125 ADC family — no coarse residual)
  private lazy val codebooksDf = Pq.fit(emb, m, kc, 2)
  private lazy val codebooks = codebooksDf.as[(Int, Long, Seq[Double])].collect().toSeq

  // the fixed query panel (corpus members, the q208 posture) and the
  // refit-time truth snapshot over the FULL index
  private lazy val panelDf = emb.filter(col("vec_id") < nPanel)
  private lazy val panel = panelDf.as[(Long, Seq[Double])].collect().toSeq.sortBy(_._1)
  private lazy val truthAll = Pq.bruteL2TopK(panelDf, emb, k)

  private def batchSys(corpus: DataFrame): DataFrame =
    Pq.adcTopK(panelDf, Pq.encode(corpus, codebooksDf, m), codebooksDf, m, kc, k)

  private def asEpoch(sys: DataFrame, epoch: Long) =
    sys.select(col("q_id").as("qId"), lit(epoch).as("epoch"),
      col("n_id").as("nId"), col("d2"), col("rk")).as[EpochTopK]

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("per-epoch streamed ADC top-k and recall card equal the batch card, under redelivery") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[VecRow]
    // stateless row-local encode (bit-equal to Pq.encode per PqIngestSpec),
    // then the stateful panel heap
    val codesStream = ms.toDS().toDF()
      .select(col("vecId"),
        StreamingPqIngest.codesExpr(col("vec"), codebooks, m).as("codes"))
      .as[CodeVec]
    val sysStream = StreamingRetrievalEval.panelTopK(codesStream, panel, codebooks, m, kc, k)
    val qTop = sysStream.writeStream.format("memory")
      .queryName("sre_topk").outputMode("append").start()
    val qCard = StreamingRetrievalEval
      .card(StreamingRetrievalEval.panelTopK(codesStream, panel, codebooks, m, kc, k),
        truthAll, nPanel, k)
      .writeStream.format("memory").queryName("sre_card").outputMode("update").start()
    try {
      def sync(): Unit = { qTop.processAllAvailable(); qCard.processAllAvailable() }
      ms.addData(waves(0): _*); sync()
      ms.addData(waves(1): _*); sync()
      // wave 3 REDELIVERS wave 1 — replayed postings carry identical codes,
      // so the heap's duplicate collapse must keep every rank unchanged
      ms.addData(waves(2) ++ waves(0): _*); sync()

      val streamed = spark.table("sre_topk").as[EpochTopK].collect()
      assert(streamed.map(_.epoch).max == 3L)
      def epochRows(e: Long): Set[(Long, Long, Double, Long)] =
        streamed.filter(_.epoch == e).map(r => (r.qId, r.nId, r.d2, r.rk)).toSet
      def batchRows(sys: DataFrame): Set[(Long, Long, Double, Long)] =
        sys.as[(Long, Long, Double, Long)].collect().toSet

      // epoch 1 = the batch operators run over wave-1 rows only; epoch 3 =
      // over everything — parity at a PREFIX epoch, not just after catch-up
      val prefix = emb.filter(col("vec_id") < 12)
      assert(epochRows(1L) == batchRows(batchSys(prefix)))
      assert(epochRows(3L) == batchRows(batchSys(emb)))

      // the card: one row per epoch, each equal to the same card fold over
      // the batch snapshot at that epoch (truth fixed at the refit snapshot)
      val cards = spark.table("sre_card")
      assert(cards.select(col("epoch")).as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
      assert(rows(cards.filter(col("epoch") === 1L)) ==
        rows(StreamingRetrievalEval.card(asEpoch(batchSys(prefix), 1L), truthAll, nPanel, k)))
      assert(rows(cards.filter(col("epoch") === 3L)) ==
        rows(StreamingRetrievalEval.card(asEpoch(batchSys(emb), 3L), truthAll, nPanel, k)))
      // sanity: the final card is a REAL approximation reading (some hits,
      // bounded by the k·|panel| ceiling), not a degenerate all-or-nothing
      val nHits3 = cards.filter(col("epoch") === 3L)
        .select(col("n_hits")).as[Long].collect().head
      assert(nHits3 > 0L && nHits3 <= nPanel * k)
    } finally { qTop.stop(); qCard.stop() }
  }
}
