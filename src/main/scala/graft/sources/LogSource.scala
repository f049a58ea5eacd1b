package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

/** HTTP access-log parsing (PDF1 pp. 1-2 format, FIXTURES.md F5):
  *
  *   ip [dd/Mon/yyyy:HH:mm:ss Z] "METHOD url HTTP/1.1" METHOD status bytes millis
  *
  * One regexp_extract per field over the raw line scan (single codegen stage),
  * timestamps parsed into a real TimestampType event-time column — the column
  * the windowed aggregations (batch and streaming) key on.
  * Malformed lines yield nulls and are dropped by `parsed`'s filter.
  */
object LogSource {

  private val re =
    """^(\S+) \[([^\]]+)\] "(\S+) (\S+) ([^"]*)" (\S+) (\d+) (\d+) (\d+)$"""

  def parse(raw: DataFrame, lineCol: String = "line"): DataFrame = {
    val l = col(lineCol)
    raw.select(
      regexp_extract(l, re, 1).as("ip"),
      // try_: malformed lines must yield null, not an ANSI runtime error
      try_to_timestamp(regexp_extract(l, re, 2), lit("dd/MMM/yyyy:HH:mm:ss Z")).as("ts"),
      regexp_extract(l, re, 3).as("method"),
      regexp_extract(l, re, 4).as("url"),
      regexp_extract(l, re, 6).as("method2"),
      // try_cast: a malformed line yields nulls, not an ANSI cast error
      regexp_extract(l, re, 7).try_cast(IntegerType).as("status"),
      regexp_extract(l, re, 8).try_cast(LongType).as("bytes"),
      regexp_extract(l, re, 9).try_cast(LongType).as("response_ms"))
  }

  /** Valid records only (ts parsed, status present). */
  def parsed(spark: SparkSession, dir: String): DataFrame =
    parse(spark.read.textFile(dir).toDF("line"))
      .filter(col("ts").isNotNull && col("status").isNotNull)
}
