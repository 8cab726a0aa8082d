package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, rest @ _*) = args
    // optional 3rd arg: comma-separated query names — run only those
    // (local iteration aid; the driver always runs the full set)
    val only: Set[String] = rest.headOption
      .map(_.split(",").toSet).getOrElse(Set.empty)
    // a typo'd filter would otherwise run NOTHING and report a green
    // (empty) partial gate
    val unknown = only.diff(SparkEntry.queries.keySet)
    require(unknown.isEmpty,
      s"unknown query name(s) in filter: ${unknown.toSeq.sorted.mkString(",")}")
    val spark = Session.local()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
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
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Manifest of every declared query, so the compare step can flag a
    // query that threw (and therefore wrote no output dir) instead of
    // silently skipping it. A FILTERED run writes a DISTINCT manifest
    // name (and removes the other) so its outDir can never be
    // mistaken for a full gate — the comparer announces partial runs.
    Files.deleteIfExists(Paths.get(s"$outDir/queries.json"))
    Files.deleteIfExists(Paths.get(s"$outDir/queries_partial.json"))
    val manifest =
      if (only.isEmpty) "queries.json" else "queries_partial.json"
    Files.writeString(Paths.get(s"$outDir/$manifest"),
      SparkEntry.queries.keys.toSeq
        .filter(k => only.isEmpty || only(k))
        .sorted.map(q).mkString("[", ",", "]"))
    spark.stop()
  }
}
