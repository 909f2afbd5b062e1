package graft.tools

import java.nio.file.{Files, Paths}

/** Dump `SparkEntry.oracleSql` as JSON without running any query — the
  * oracle map is pure metadata, so re-checking existing Verify parquet
  * dumps after an ORACLE-side-only change (e.g. an [[graft.functions.Exact]]
  * SQL-fragment fix) needs no Spark re-run: regenerate the json, overwrite
  * `outDir/oracle_sql.json`, re-run tools/check.py. Same escaping as
  * [[graft.Verify]]. */
object DumpOracle {
  def main(args: Array[String]): Unit = {
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = graft.SparkEntry.oracleSql.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(args(0)), json)
    println(s"wrote ${args(0)} (${graft.SparkEntry.oracleSql.size} entries)")
  }
}
