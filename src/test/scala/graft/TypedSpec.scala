package graft

import graft.sources.Typed
import org.apache.spark.sql.functions._

class TypedSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("typed views decode the engine tables with full field safety") {
    val e = Typed.events(spark, dir)
    assert(e.filter(_.event_type == "click").count() > 0L)
    val d = Typed.documents(spark, dir).head()
    assert(d.n_chars == d.text.length || d.n_chars > 0)
    val emb = Typed.embeddings(spark, dir).head()
    assert(emb.embedding.length == 64)
  }

  test("typed filters still push down to the parquet scan") {
    val plan = Typed.events(spark, dir)
      .filter(col("event_type") === "click")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("event_type"))
  }

  test("doc vectors render to the reference's text-file sink format") {
    val docs = Seq((1L, "b a"), (2L, "c c")).toDF("doc_id", "text")
    val toks = graft.operators.TextPipeline.tokenize(docs)
    val tfidf = graft.operators.TextPipeline.tfidf(
      graft.operators.TextPipeline.tf(graft.operators.TextPipeline.termCounts(toks)),
      graft.operators.TextPipeline.idf(toks))
    val vecs = graft.operators.TextPipeline.docVectors(
      tfidf, graft.operators.TextPipeline.vocab(toks))
    val out = java.nio.file.Files.createTempDirectory("vecsink").toString + "/t"
    vecs.select(concat_ws("\t", col("doc_id"), col("vec")).as("value"))
      .coalesce(1).write.mode("overwrite").text(out)
    val lines = spark.read.textFile(out).collect().sorted
    assert(lines.length == 2 && lines.forall(_.matches("\\d+\\t(\\d+:-?\\d+ ?)+")))
  }
}
