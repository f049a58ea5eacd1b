package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.{queries => cat}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The full query inventory lives in `graft.queries.*` catalogs as [[QueryDef]]s;
  * this object flattens them into the three maps the driver consumes.
  */
object SparkEntry {

  /** Every implemented, verifiable query of the engine. */
  def all: Seq[QueryDef] =
    cat.Relational.defs ++
      cat.Events.defs ++
      cat.Text.defs ++
      cat.Graph.defs ++
      cat.Ml.defs ++
      cat.Curation.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    all.head.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(sql => q.name -> sql.stripMargin.trim)).toMap

  /** Headline benchmark subset timed by [[Bench]]. */
  def benchQueries: Seq[QueryDef] = all.filter(_.bench)
}
