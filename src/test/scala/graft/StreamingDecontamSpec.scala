package graft

import graft.streaming.StreamingDecontam
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingDecontamSpec extends SparkSpec {
  import spark.implicits._

  // a 10-token eval sentence shared verbatim (3 clean 8-grams inside it)
  private val eval1 = "held out benchmark question answer pairs must never leak out"
  // a second suite entry, 9 tokens (2 clean 8-grams)
  private val eval2 = "the standardized test prompt appears verbatim in evaluation"

  private val benchDocs = Seq(
    (100L, s"intro words then $eval1 and trailing text"),
    (101L, s"$eval2 padded with more benchmark only words"),
    (102L, s"another copy $eval1 in a second benchmark doc"))

  private val trainDocs = Seq(
    (1L, s"training text containing $eval1 wholesale"), // hits 100 AND 102
    (2L, s"clean document with no overlap at all whatsoever in eight grams"),
    (3L, s"$eval2 leaked into this one"), // hits 101
    (4L, "short doc")) // under 8 tokens: no grams at all

  test("streamed decontamination equals the batch twin across waves") {
    implicit val ctx = spark.sqlContext
    val bench = StreamingDecontam.benchmarkGrams(
      benchDocs.toDF("doc_id", "text"))
    // every eval sentence contributed grams from BOTH its benchmark docs
    assert(bench.values.exists(_ == Seq(100L, 102L)))

    val ms = MemoryStream[(Long, String)]
    val q = StreamingDecontam.flag(ms.toDF().toDF("doc_id", "text"), bench)
      .writeStream.format("memory").queryName("decontam").outputMode("append")
      .start()
    try {
      trainDocs.grouped(2).foreach { wave =>
        ms.addData(wave: _*)
        q.processAllAvailable()
      }
      val streamed = spark.table("decontam")
        .as[(Long, Long, Long, Long)].collect().toSet
      val batch = StreamingDecontam.flag(trainDocs.toDF("doc_id", "text"), bench)
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(streamed == batch)
      // doc 1 carries the full eval1 sentence -> its in-sentence grams hit
      // benchmark docs 100 and 102; first attribution is 100
      val d1 = streamed.find(_._1 == 1L).get
      assert(d1._3 == 2L && d1._4 == 100L && d1._2 >= 3L)
      // doc 3 hits only benchmark doc 101
      val d3 = streamed.find(_._1 == 3L).get
      assert(d3._3 == 1L && d3._4 == 101L)
      // docs 2 and 4 never emit
      assert(!streamed.exists(r => r._1 == 2L || r._1 == 4L))
    } finally q.stop()
  }

  test("streamed span surgery equals q238's batch emission on an ordered replay") {
    implicit val ctx = spark.sqlContext
    // q238's exact corpus: the driver's sf0.001 documents table under the
    // same deterministic enrichment (contaminating sentences appended on
    // the %13/%7 arms) and the same %97 benchmark slice — the stream replays
    // the ENRICHED ingest, doc_id-ordered, in micro-batch waves
    val dir = "/root/testdata/sf0.001"
    val e1 = " held out benchmark question answer pairs must never leak into training"
    val e2 = " the standardized test prompt appears verbatim in this document for evaluation"
    val enriched = spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("text", concat(col("text"),
        when(col("doc_id") % 13 === 0, lit(e1)).otherwise(lit("")),
        when(col("doc_id") % 7 === 0, lit(e2)).otherwise(lit(""))))
    val bench = StreamingDecontam.benchmarkGrams(
      enriched.filter(col("doc_id") % 97 === 0).select(col("doc_id"), col("text")))
    val train = enriched.filter(col("doc_id") % 97 =!= 0)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .collect().sortBy(_._1)

    val ms = MemoryStream[(Long, String)]
    val q = StreamingDecontam.surgeryEmit(ms.toDF().toDF("doc_id", "text"), bench)
      .writeStream.format("memory").queryName("surgery").outputMode("append")
      .start()
    try {
      train.grouped(64).foreach { wave =>
        ms.addData(wave.toSeq: _*)
        q.processAllAvailable()
      }
      val streamed = spark.table("surgery")
        .as[(Long, Long, Long, Long, String)].collect().toSet
      val batch = SparkEntry.queries("q238_decontam_surgery_emit")(spark, dir)
        .as[(Long, Long, Long, Long, String)].collect().toSet
      // non-emptiness first: equality of two empty sets would prove nothing
      // (the q218/q224 lesson)
      assert(batch.nonEmpty)
      assert(streamed == batch)
      // the ingest-time cut is stateless end to end — same contract as flag
      assert(q.lastProgress.stateOperators.isEmpty)
    } finally {
      q.stop()
      graft.Caching.release()
    }
  }

  test("the streaming plan is stateless: no aggregation or join state") {
    implicit val ctx = spark.sqlContext
    val bench = StreamingDecontam.benchmarkGrams(benchDocs.toDF("doc_id", "text"))
    val ms = MemoryStream[(Long, String)]
    val q = StreamingDecontam.flag(ms.toDF().toDF("doc_id", "text"), bench)
      .writeStream.format("memory").queryName("decontam_plan").outputMode("append")
      .start()
    try {
      ms.addData((1L, s"carrier of $eval1 here"))
      q.processAllAvailable()
      val plan = q.lastProgress.sources.length +
        q.lastProgress.stateOperators.length
      // one source, ZERO stateful operators — the whole gate is per-row
      assert(q.lastProgress.stateOperators.isEmpty, s"unexpected state: $plan")
    } finally q.stop()
  }
}
