package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Dev: decompose the engine-graded streaming replays' cost floor —
  * the 11 replay rows are ~60 s of the r13 bench, and the claim
  * "that's the price of grading streaming end-to-end" deserves an
  * attribution table, not an adjective. Measured at sf0.1 with the
  * replay harness's exact contract (6 event-time buckets, mtime
  * stamping, maxFilesPerTrigger=1, AvailableNow, shuffle width 4,
  * foreachBatch parquet sink):
  *
  *   prep     — bucket filtering/writing + mtime stamping (6 jobs)
  *   stateless— full replay of a PASS-THROUGH projection (no stateful
  *              operator): source listing + 6 micro-batch plan/commit
  *              cycles + sink writes = the harness floor every graded
  *              row pays
  *   stateful — full replay of the cheapest stateful op (count by key,
  *              update mode): floor + one state store per partition
  *              per batch
  *
  * min-of-2 passes. `Test/runMain graft.StreamFloorProbe [sfDir]`.
  */
object StreamFloorProbe {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = EntryKit.session()
    spark.sparkContext.setLogLevel("ERROR")

    def withDir[A](f: String => A): A = {
      val p = java.nio.file.Files.createTempDirectory("graft_floor")
      try f(p.toString) finally ProbeUtil.deleteRecursively(p)
    }

    val ev = Tables.events(spark, d)
      .select("event_id", "ts", "user_id", "event_type", "value")

    def prep(dir: String): Unit = {
      val bounds = ev.agg(min(unix_micros(col("ts"))).as("lo"),
        max(unix_micros(col("ts"))).as("hi")).collect().head
      val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
      val span = math.max(1L, hi - lo + 1)
      val t0 = (System.currentTimeMillis() / 60000L) * 60000L - 600000L
      (0 until 6).foreach { b =>
        ev.filter(expr(
            s"(unix_micros(ts) - ${lo}L) * 6 div ${span}L") === b.toLong)
          .coalesce(1).write.mode("append").parquet(s"$dir/in")
        new java.io.File(s"$dir/in").listFiles()
          .filter(f => f.getName.startsWith("part-") &&
            f.lastModified() > t0 + 10000L)
          .foreach(f => require(f.setLastModified(t0 + b * 1000L)))
      }
    }

    def replay(dir: String, stateful: Boolean): Unit = {
      val in = spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$dir/in")
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      try {
        val job =
          if (stateful)
            in.groupBy("event_type").agg(count(lit(1)).as("n"))
          else in.select(col("event_id"), col("event_type"))
        val q = job.writeStream
          .outputMode(if (stateful) "update" else "append")
          .option("checkpointLocation", s"$dir/ckpt_$stateful")
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
            b.write.mode("append").parquet(s"$dir/out_$stateful")
          }
          .trigger(Trigger.AvailableNow()).start()
        require(q.awaitTermination(300000))
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // warm the session (parquet footers, codegen)
    ev.count()
    val samples = (0 until 2).map { _ =>
      withDir { dir =>
        val tPrep = time(prep(dir))
        val tStateless = time(replay(dir, stateful = false))
        val tStateful = time(replay(dir, stateful = true))
        (tPrep, tStateless, tStateful)
      }
    }
    val best = (samples.map(_._1).min, samples.map(_._2).min,
      samples.map(_._3).min)
    println("| stage | sec |")
    println("|---|---|")
    println(f"| bucket prep (6 filtered writes + stamping) | ${best._1}%.2f |")
    println(f"| stateless replay (harness floor) | ${best._2}%.2f |")
    println(f"| stateful replay (floor + state store) | ${best._3}%.2f |")
    spark.stop()
  }
}
