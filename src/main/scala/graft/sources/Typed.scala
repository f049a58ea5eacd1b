package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}

/** Typed case-class views over the engine tables (SURVEY.md §1: thin
  * `Dataset[T]` surfaces at API boundaries, untyped DataFrames inside the
  * relational core). Encoders give compile-time field safety to user code
  * without giving up Catalyst optimization — the typed view is a `select`
  * + `as[T]`, not a different plan.
  */
object Typed {

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                   event_type: String, value: Double, props: String)

  case class Document(doc_id: Long, text: String, lang: String, source: String,
                      n_chars: Long)

  case class Embedding(vec_id: Long, embedding: Array[Float], label: Int)

  case class LogEvent(ip: String, ts: java.sql.Timestamp, method: String, url: String,
                      status: Int, bytes: Long, response_ms: Long)

  def events(spark: SparkSession, dir: String): Dataset[Event] = {
    import spark.implicits._
    Tables(spark, dir, "events").as[Event]
  }

  def documents(spark: SparkSession, dir: String): Dataset[Document] = {
    import spark.implicits._
    Tables(spark, dir, "documents").as[Document]
  }

  def embeddings(spark: SparkSession, dir: String): Dataset[Embedding] = {
    import spark.implicits._
    Tables(spark, dir, "embeddings").as[Embedding]
  }

  def logs(spark: SparkSession, dir: String): Dataset[LogEvent] = {
    import spark.implicits._
    LogSource.parsed(spark, dir).drop("method2").as[LogEvent]
  }
}
