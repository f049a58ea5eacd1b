package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Directory-per-class text corpus ingestion — the reference's scan contract
  * (class = grandparent dir, split = great-grandparent, doc id = file name;
  * TF_IDF_Compute.java:76-78, Count/CountMapper.java:54-56) as one scan.
  *
  * The reference runs one MR job per class directory (~40 sequential jobs,
  * TF_IDF_Compute.java:464-485); here a single `spark.read.text` over the
  * corpus root covers every class and split, with the path metadata exposed
  * as real columns via `input_file_name()`.
  *
  * Output schema: (split, label, doc_id, line).
  */
object CorpusSource {

  private def withPathMeta(df: DataFrame): DataFrame = {
    val parts = split(input_file_name(), "/")
    df.withColumn("doc_id", element_at(parts, -1))
      .withColumn("label", element_at(parts, -2))
      .withColumn("split", element_at(parts, -3))
  }

  def lines(spark: SparkSession, root: String): DataFrame =
    withPathMeta(spark.read.textFile(s"$root/*/*/*").toDF("line"))
      .select(col("split"), col("label"), col("doc_id"), col("line"))

  /** Whole-document view: one row per doc (order-preserving `wholetext` read) —
    * matches the `documents`-table shape so every text operator applies
    * unchanged. */
  def documents(spark: SparkSession, root: String): DataFrame =
    withPathMeta(spark.read.option("wholetext", "true").textFile(s"$root/*/*/*").toDF("text"))
      .select(col("split"), col("label"), col("doc_id"), col("text"))
}
