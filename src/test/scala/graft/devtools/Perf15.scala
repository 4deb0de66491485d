package graft

/** Round-15 optimization harness (dev tool, test scope — not part of
  * the driver contract).
  *
  * Usage:
  *   runMain graft.Perf15 dump <tag> <q...>   — write plans/r15/<q>_<tag>.txt
  *     (explain "formatted") for each named query at sf0.1.
  *   runMain graft.Perf15 time <n> <q...>     — run each named query n times
  *     with the bench's action (clearCache + count), print per-run seconds.
  *   runMain graft.Perf15 noop <n> <q...>     — same but force full-row
  *     evaluation through the noop sink (guide §1.4), so presentation
  *     ORDER BY etc. are NOT eliminated. Use for decomposition only; the
  *     bench contract stays count().
  *
  * Session config is EntryKit's — identical to Bench by construction.
  */
object Perf15 {
  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = EntryKit.session()
    // same warmup as Bench: tables + codegen
    try {
      SparkEntry.entry(spark).count()
      spark.range(1000).selectExpr("sum(id)").collect()
      Tables.testdataNames.foreach { t =>
        try Tables.table(spark, sfDir, t).count()
        catch { case _: Throwable => () }
      }
    } catch { case _: Throwable => () }
    mode match {
      case "dump" =>
        val tag = args(1)
        val names = args.drop(2)
        java.nio.file.Files.createDirectories(
          java.nio.file.Paths.get("plans/r15"))
        names.foreach { n =>
          val df = SparkEntry.queries(n)(spark, sfDir)
          val s = df.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(s"plans/r15/${n}_$tag.txt"), s)
          println(s"wrote plans/r15/${n}_$tag.txt (${s.length} chars)")
        }
      case "time" | "noop" =>
        val n = args(1).toInt
        val names = args.drop(2)
        names.foreach { q =>
          val fn = SparkEntry.queries(q)
          val ts = (1 to n).map { _ =>
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(q)
            val t0 = System.nanoTime()
            if (mode == "noop")
              fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            else fn(spark, sfDir).count()
            (System.nanoTime() - t0) / 1e9
          }
          println(f"TIME $q%-35s min=${ts.min}%7.3f  runs=" +
            ts.map(t => f"$t%.3f").mkString(","))
        }
      case other => sys.error(s"unknown mode $other")
    }
    spark.stop()
  }
}
