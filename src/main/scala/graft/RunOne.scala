package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: run a single SparkEntry query and dump it to parquet —
  * `runMain graft.RunOne <queryName> <sfDir> <outDir>` — so one new
  * query can be graded against its oracle without a full Verify pass.
  * Session config mirrors Verify exactly.
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.graft.collapseRollupExplode", "true")
      .config("spark.graft.vecDotRewrite.assumeNoNullElements", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries(name)(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    // The full oracle map, so tools/oracle_check.py can grade the dump
    // without a Verify pass (same JSON shape Verify writes). Escape
    // matches Verify: backslash, quote, and ALL control chars (<0x20).
    def esc(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.toSeq.sortBy(_._1).map { case (k, v) =>
      esc(k) + ": " + esc(v)
    }.mkString("{", ",\n", "}")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"),
      json.getBytes("UTF-8"))
    spark.stop()
  }
}
