package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Parquet table loaders for the driver-generated star schema (TESTDATA.md).
  *
  * Reading is a plain `spark.read.parquet` so Catalyst gets real file statistics:
  * filter pushdown, column pruning and partition coalescing all apply at the scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // The events table stores timestamp[us] with isAdjustedToUTC=false, which
    // Spark 4 infers as TIMESTAMP_NTZ. Type-strict instant functions
    // (unix_micros, ...) reject NTZ at analysis time, so normalize to
    // TIMESTAMP here. All entry points pin spark.sql.session.timeZone=UTC,
    // so the cast preserves the wall clock and epoch micros match DuckDB's
    // epoch_us over the same parquet.
    if (df.schema.fields.exists(f => f.name == "ts" && f.dataType == TimestampNTZType))
      df.withColumn("ts", col("ts").cast(TimestampType))
    else df
  }
}
