package graft

/** Dev tool: run a single SparkEntry query and dump it to parquet —
  * `runMain graft.RunOne <queryName> <sfDir> <outDir>` — so one new
  * query can be graded against its oracle without a full Verify pass.
  * Session config and oracle_sql.json bytes are EntryKit's, i.e.
  * identical to Verify's by construction.
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, outDir) = args
    val spark = EntryKit.session()
    SparkEntry.queries(name)(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"),
      EntryKit.oracleSqlJson)
    spark.stop()
  }
}
