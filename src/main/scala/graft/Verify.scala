package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1)
    // optional: restrict to named keys (fast local iteration on one
    // operator). A filtered run also filters oracle_sql.json, so point it at
    // a SCRATCH outDir — never the driver's canonical one, where a shrunken
    // oracle file next to stale dumps would silently narrow the gate.
    val only: Set[String] = args.drop(2).toSet
    if (only.nonEmpty) {
      System.err.println(
        s"[verify] PARTIAL run (${only.size} keys) — use a scratch outDir, not the driver's")
      // refuse to SHRINK an existing oracle file: a filtered oracle_sql.json
      // beside stale full dumps would silently narrow the correctness gate.
      // Re-running the same filtered key set into the same scratch dir stays
      // allowed (no key disappears).
      val oraclePath = Paths.get(s"$outDir/oracle_sql.json")
      if (Files.exists(oraclePath)) {
        val existing = Files.readString(oraclePath)
        val shrunk = SparkEntry.oracleSql.keys
          .filterNot(only).filter(k => existing.contains("\"" + k + "\""))
        if (shrunk.nonEmpty) {
          System.err.println(
            s"[verify] REFUSING: $oraclePath already covers ${shrunk.size} key(s) this run " +
              s"would drop (e.g. ${shrunk.take(3).mkString(", ")}); use a fresh scratch outDir")
          sys.exit(2)
        }
      }
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true") // see Tables.events
      .config("spark.ui.enabled", "false")
      .getOrCreate()
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
      .filter { case (k, _) => only.isEmpty || only(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
