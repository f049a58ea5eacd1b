package graft

import graft.ml.Knn
import graft.operators.TextPipeline
import graft.streaming.StatefulOps
import graft.streaming.StatefulOps.KeyedValue
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class SparseKnnStatefulSpec extends SparkSpec {
  import spark.implicits._

  test("sparse map-cosine kNN agrees with the dense kernel end-to-end") {
    val docs = Seq(
      (1L, "space", "rocket orbit launch star rocket"),
      (2L, "space", "orbit star rocket nebula"),
      (3L, "autos", "engine car wheel road engine"),
      (4L, "autos", "car road wheel gear"),
      (10L, "space", "rocket star orbit"),
      (11L, "autos", "engine wheel car")
    ).toDF("doc_id", "label", "text")
    val toks = TextPipeline.tokenize(docs)
    val tfidf = TextPipeline.tfidf(
      TextPipeline.tf(TextPipeline.termCounts(toks)), TextPipeline.idf(toks))
    val sparse = TextPipeline.docVectorMap(tfidf, TextPipeline.vocab(toks))
      .join(docs.select($"doc_id", $"label"), "doc_id")
      .select($"doc_id".as("id"), $"label", $"features")
    val pred = Knn.classifySparse(
      sparse.filter($"id" >= 10L), sparse.filter($"id" < 10L), k = 3)
      .as[(Long, String)].collect().toMap
    assert(pred == Map(10L -> "space", 11L -> "autos"))
  }

  test("flatMapGroupsWithState accumulates running stats across batches") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[KeyedValue]
    val q = StatefulOps.runningStats(ms.toDS())
      .writeStream.format("memory").queryName("rs").outputMode("update").start()
    try {
      ms.addData(KeyedValue(1L, 2.0), KeyedValue(1L, 3.0), KeyedValue(2L, 10.0))
      q.processAllAvailable()
      ms.addData(KeyedValue(1L, 5.0)) // state must carry over: n=3, sum=10
      q.processAllAvailable()
      val last = spark.table("rs").filter($"key" === 1L)
        .orderBy($"n".desc).limit(1)
        .select($"n", $"sum", $"max").as[(Long, Double, Double)].head()
      assert(last == ((3L, 10.0, 5.0)))
    } finally q.stop()
  }
}
