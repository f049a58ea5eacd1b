package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers: pre-shuffle a fact table once on its join key so
  * every subsequent equi-join or aggregation on that key is co-located —
  * the standing answer to "this join shuffles 100 TB every run".
  *
  * Both sides bucketed on the join key with the same bucket count →
  * sort-merge join with zero Exchange (verified in BucketingSpec).
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted external table at `path`. */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
