package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query of the engine.
  *
  * @param name   stable query id (keys `SparkEntry.queries` / `oracleSql`)
  * @param run    the Spark plan: (session, sfDir with `<table>.parquet` files) => result
  * @param oracle equivalent ANSI SQL runnable by DuckDB over views named after the
  *               parquet tables; None for ops not expressible in SQL (driver then
  *               records a weaker rows-only check)
  * @param bench  whether [[Bench]] times this query as a headline benchmark
  *
  * Cross-engine comparison contract (the driver sorts columns by name and hashes
  * values): every computed column is aliased identically on both sides; integer
  * outputs are BIGINT on both sides; floating-point aggregates are computed via
  * exact DECIMAL sums (see [[functions.Exprs.dsum]]) so the resulting DOUBLE is
  * bit-identical regardless of summation order.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    bench: Boolean = false)
