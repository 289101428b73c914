package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // args: <sfDir> <outDir> [comma-separated subset, for local iteration]
    val sfDir = args(0)
    val outDir = args(1)
    val only: Set[String] = if (args.length > 2) args(2).split(',').toSet else Set.empty
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // a reused outDir must not ghost-carry queries retired from the
    // catalog (a stale dump would be graded as if still claimed).
    // Only directories that LOOK like prior dumps (parquet _SUCCESS
    // marker) are candidates — an outDir mistakenly pointed at a source
    // tree must never see unrelated directories recursively deleted.
    if (only.isEmpty) {
      val live = SparkEntry.queries.keySet
      Option(new java.io.File(outDir).listFiles()).getOrElse(Array.empty)
        .filter(f =>
          f.isDirectory && !live(f.getName) && new java.io.File(f, "_SUCCESS").exists())
        .foreach { f =>
          System.err.println(s"[verify] removing stale dump ${f.getName}")
          def rm(x: java.io.File): Unit = {
            Option(x.listFiles()).getOrElse(Array.empty).foreach(rm); x.delete(); ()
          }
          rm(f)
        }
    }
    SparkEntry.queries.filter(kv => only.isEmpty || only(kv._1)).foreach { case (name, fn) =>
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
    spark.stop()
  }
}
