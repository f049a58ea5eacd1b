package graft

import graft.ml.{KMeans, Pq}
import graft.streaming.StreamingPqIngest
import graft.streaming.StreamingPqIngest.{CodeRow, VecRow}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming IVF-PQ ingest ≡ batch index build on the same vectors: the
  * stream-appended (cell, codes) postings must be BIT-EQUAL to what the
  * batch chain (KMeans cell assign → residual → Pq.encode) produces, with
  * re-delivered rows absorbed exactly once — the q88 incremental posture
  * extended to the vector index. */
class StreamingPqIngestSpec extends SparkSpec {
  import spark.implicits._

  private val m = 4
  private val kCoarse = 3
  private val kc = 4

  // deterministic 8-dim fixture: three separated blobs so the coarse cells
  // are non-trivial and every sub-codebook sees spread
  private lazy val vecs: Seq[VecRow] = (0L until 36L).map { i =>
    val blob = i % 3
    VecRow(i, (0 until 8).map(p =>
      blob * 10.0 + ((i * 7 + p * 13) % 17) * 0.25 + p * 0.1))
  }

  private lazy val emb = vecs.map(v => (v.vecId, v.vec)).toDF("vec_id", "vec")

  // the batch index build (the refit whose models the stream then serves)
  private lazy val coarseDf = KMeans.fit(emb, kCoarse, 2)
  private lazy val coarse = coarseDf.as[(Long, Seq[Double])].collect().toSeq.sortBy(_._1)
  private lazy val res = KMeans.assign(emb, coarseDf)
    .join(broadcast(coarseDf), "centroid_id")
    .select(col("vec_id"), col("centroid_id").as("cell"),
      zip_with(col("vec"), col("centroid"), (x, c) => x - c).as("vec"))
  private lazy val codebooksDf = Pq.fit(res.select(col("vec_id"), col("vec")), m, kc, 2)
  private lazy val codebooks = codebooksDf.as[(Int, Long, Seq[Double])].collect().toSeq
  private lazy val batchIndex: Set[(Long, Long, Seq[Long])] =
    Pq.encode(res.select(col("vec_id"), col("vec")), codebooksDf, m)
      .join(res.select(col("vec_id"), col("cell")), "vec_id")
      .select(col("cell"), col("vec_id"), col("codes"))
      .as[(Long, Long, Seq[Long])].collect().toSet

  test("row-local cell + codes expressions equal the batch assign/encode") {
    val rowLocal = emb
      .withColumn("cell", StreamingPqIngest.cellExpr(col("vec"), coarse))
      .withColumn("codes", StreamingPqIngest.codesExpr(
        StreamingPqIngest.residualExpr(col("vec"), col("cell"), coarse), codebooks, m))
      .select(col("cell"), col("vec_id"), col("codes"))
      .as[(Long, Long, Seq[Long])].collect().toSet
    assert(rowLocal == batchIndex && rowLocal.nonEmpty)
  }

  test("stream-appended codes across micro-batches equal the batch index, exactly once") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[VecRow]
    val q = StreamingPqIngest.ingest(ms.toDS(), coarse, codebooks, m)
      .writeStream.format("memory").queryName("pqingest").outputMode("update").start()
    try {
      // three arrival waves; wave 3 REDELIVERS all of wave 1 (a replayed
      // log) — the state must absorb the duplicates, not re-append them
      val waves = vecs.grouped(12).toSeq
      ms.addData(waves(0): _*); q.processAllAvailable()
      ms.addData(waves(1): _*); q.processAllAvailable()
      ms.addData(waves(2) ++ waves(0): _*); q.processAllAvailable()
      val streamed = spark.table("pqingest").as[CodeRow].collect()
      // exactly one emission per vector (idempotent under redelivery)
      assert(streamed.length == vecs.length)
      assert(streamed.map(_.vecId).distinct.length == vecs.length)
      // the appended postings ARE the batch index
      assert(streamed.map(r => (r.cell, r.vecId, r.codes)).toSet == batchIndex)
      // per-cell occupancy counts up monotonically to the cell's final size
      streamed.groupBy(_.cell).foreach { case (_, rows) =>
        assert(rows.map(_.cellSize).sorted.toSeq == (1L to rows.length.toLong))
      }
    } finally q.stop()
  }
}
