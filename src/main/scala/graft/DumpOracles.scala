package graft

import java.nio.file.{Files, Paths}

/** Dev utility: dump `SparkEntry.oracleSql` as JSON without starting Spark,
  * so the DuckDB side of each oracle can be smoke-tested quickly
  * (tools/oracle_smoke.py). */
object DumpOracles {
  def main(args: Array[String]): Unit = {
    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(args.headOption.getOrElse("/tmp/oracle_sql.json")), json)
    println(s"dumped ${SparkEntry.oracleSql.size} oracles; ${SparkEntry.all.size} queries total")
  }
}
