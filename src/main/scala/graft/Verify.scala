package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional third arg: substring filter for local iteration — comma-
    // separated patterns match any (same syntax as Bench's filter)
    val selected = args.lift(2) match {
      case Some(subs) =>
        val pats = subs.split(',').filter(_.nonEmpty)
        SparkEntry.queries.filter { case (n, _) => pats.exists(n.contains) }
      case None => SparkEntry.queries
    }
    val spark = GraftSession.local()
    new java.io.File(outDir).mkdirs()
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // Fixture-backed oracles (q129's on-disk WAV parquet) embed the
    // dataset-dir NAME in their scan path via the __SF_NAME__ token;
    // substitute the actual dir here so the oracle is derived from the
    // same sfDir the Spark side wrote under — it can't silently go stale
    // when the driver verifies at a different scale factor.
    val sfName = new java.io.File(sfDir).getName
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v.replace("__SF_NAME__", sfName))}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
