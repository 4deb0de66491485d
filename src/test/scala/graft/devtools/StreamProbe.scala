package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingJobs

/** Dev: MEASURED state-boundedness of the streaming operators — the
  * streaming family's 100 TB claim is "state is bounded by the
  * watermark horizon, not by input consumed", and this probe turns
  * that from prose into a curve. It feeds B micro-batches of R events
  * each through the watermarked streaming dedup and the tumbling
  * aggregation, with event time advancing 30 min per batch under the
  * 1 h watermark, EVERY key unique (worst case: every row enters
  * state), and records per batch: cumulative input, state rows held,
  * and batch duration. A healthy operator shows state PLATEAUING at
  * ~watermark-horizon rows and flat batch time while cumulative input
  * grows without bound; state tracking input means an unbounded-state
  * bug (the dauStream >= 24 h watermark rule exists for exactly that).
  *
  * `Test/runMain graft.StreamProbe [batches rowsPerBatch]`
  * (default 20 5000).
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val b = if (args.length >= 1) args(0).toInt else 20
    val r = if (args.length >= 2) args(1).toInt else 5000
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    def events(mem: MemoryStream[(Long, Timestamp, Long, String, Double, String)]) =
      mem.toDF()
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .withWatermark("ts", "1 hour")

    def run(name: String,
        job: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
        mode: String): Unit = {
      val mem = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
      val q = job(events(mem)).writeStream.format("noop")
        .outputMode(mode).start()
      println(s"### $name")
      println("| batch | input_total | state_rows | batch_ms |")
      println("|---|---|---|---|")
      val t0 = 1700000000000L
      var total = 0L
      (1 to b).foreach { i =>
        val ts = t0 + i.toLong * 30 * 60 * 1000
        // every (user_id, event_type) key unique -> worst-case state
        mem.addData((0 until r).map(j =>
          (i * 1000000L + j, new Timestamp(ts + j), i * 1000000L + j,
            "click", 1.0, "{}")))
        q.processAllAvailable()
        total += r
        val p = q.lastProgress
        val state =
          if (p.stateOperators.nonEmpty) p.stateOperators.map(_.numRowsTotal).sum
          else -1L
        if (i <= 3 || i % 5 == 0)
          println(s"| $i | $total | $state | ${p.batchDuration} |")
      }
      q.stop()
    }

    run("dedupWithinWatermark (unique keys, 30min/batch, 1h watermark)",
      StreamingJobs.dedup, "append")
    run("tumbling 1h agg (append)",
      df => StreamingJobs.tumbling(df, "1 hour"), "append")
    spark.stop()
  }
}
