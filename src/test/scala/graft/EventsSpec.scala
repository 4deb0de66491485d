package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.EventsOps

/** Session/tumbling semantics on planted timelines + a Structured
  * Streaming smoke run proving the same EventsOps code executes under
  * readStream (memory sink, processAllAvailable).
  */
class EventsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val planted = Seq(
    // user 1: two sessions separated by a 40-minute gap
    (1L, ts("2024-01-01 10:00:00"), "click", 1.0, 100L),
    (1L, ts("2024-01-01 10:10:00"), "click", 2.0, 101L),
    (1L, ts("2024-01-01 10:50:00"), "view", 3.0, 102L),
    // user 2: one session, events 29 minutes apart (inside the gap)
    (2L, ts("2024-01-01 09:00:00"), "click", 4.0, 103L),
    (2L, ts("2024-01-01 09:29:00"), "click", 5.0, 104L),
  ).toDF("user_id", "ts", "event_type", "value", "event_id")

  test("session windows: 30-minute gap islands") {
    val s = EventsOps.sessions(planted, "30 minutes")
      .orderBy("user_id", "session_start")
      .select($"user_id", $"session_start".cast("string"),
        $"session_end".cast("string"), $"n_events")
      .as[(Long, String, String, Long)].collect().toSeq
    assert(s == Seq(
      (1L, "2024-01-01 10:00:00", "2024-01-01 10:40:00", 2L),
      (1L, "2024-01-01 10:50:00", "2024-01-01 11:20:00", 1L),
      (2L, "2024-01-01 09:00:00", "2024-01-01 09:59:00", 2L)))
  }

  test("tumbling windows align to the hour") {
    val t = EventsOps.tumbling(planted, "1 hour")
      .orderBy("window_start", "event_type")
      .select($"window_start".cast("string"), $"event_type", $"n_events")
      .as[(String, String, Long)].collect().toSeq
    assert(t == Seq(
      ("2024-01-01 09:00:00", "click", 2L),
      ("2024-01-01 10:00:00", "click", 2L),
      ("2024-01-01 10:00:00", "view", 1L)))
  }

  test("sliding windows double-count into overlapping windows") {
    val rows = EventsOps.sliding(planted, "1 hour", "30 minutes")
    // each event lands in exactly 2 windows
    assert(rows.agg(sum("n_events")).head().getLong(0) == planted.count() * 2)
  }

  test("bucket dedup keeps one row per (user, type, bucket)") {
    val dup = planted.unionByName(planted) // replay everything
    val d = EventsOps.bucketDedup(dup, "10 minutes")
    assert(d.count() == 5)
    assert(d.agg(sum("n_dups")).head().getLong(0) == 10)
  }

  test("as-of join: latest prior right row per key, with tolerance") {
    val purchases = Seq(
      (1L, ts("2024-01-01 10:30:00"), 900L),
      (1L, ts("2024-01-01 09:00:00"), 901L), // before any click
      (2L, ts("2024-01-01 12:00:00"), 902L),
    ).toDF("user_id", "ts", "event_id")
    val clicks = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1.0),
      (1L, ts("2024-01-01 10:15:00"), 2.0),
      (1L, ts("2024-01-01 11:00:00"), 3.0), // after the purchase
      (2L, ts("2024-01-01 08:00:00"), 4.0), // 4h before purchase
    ).toDF("user_id", "ts", "value")
    val joined = EventsOps.asofJoin(purchases, clicks, "user_id",
      "ts", "ts", "value")
      .select($"event_id", $"asof_ts".cast("string"), $"asof_value")
      .as[(Long, Option[String], Option[Double])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(joined(900L) == (Some("2024-01-01 10:15:00"), Some(2.0)))
    assert(joined(901L) == (None, None))
    assert(joined(902L) == (Some("2024-01-01 08:00:00"), Some(4.0)))
    // 1-hour tolerance: user 2's stale click falls out
    val tol = EventsOps.asofJoin(purchases, clicks, "user_id",
      "ts", "ts", "value", toleranceSec = Some(3600L))
      .select($"event_id", $"asof_value")
      .as[(Long, Option[Double])].collect().toMap
    assert(tol(900L).contains(2.0))
    assert(tol(902L).isEmpty)
  }

  test("as-of join: ts and value always come from the same right row") {
    // latest right row has a NULL value — both asof fields must come
    // from that row (a pair of independent last(ignoreNulls) would mix)
    val purchases = Seq((1L, ts("2024-01-01 10:30:00"), 900L))
      .toDF("user_id", "ts", "event_id")
    val clicks = Seq(
      (1L, ts("2024-01-01 10:00:00"), Some(5.0)),
      (1L, ts("2024-01-01 10:15:00"), None),
    ).toDF("user_id", "ts", "value")
    val got = EventsOps.asofJoin(purchases, clicks, "user_id",
      "ts", "ts", "value")
      .select($"asof_ts".cast("string"), $"asof_value")
      .as[(String, Option[Double])].head()
    assert(got == ("2024-01-01 10:15:00", None))
  }

  test("interval join: equals the theta join, emits pairs exactly once") {
    val left = planted.filter($"event_type" === "click")
      .select($"user_id", $"event_id", $"ts")
    val right = planted.select($"user_id", $"event_id".as("r_id"), $"ts")
    val got = EventsOps.intervalJoin(left, right, "user_id", "ts", "ts",
      lowerSec = 1L, upperSec = 3000L)
      .select($"event_id", $"r_r_id")
      .as[(Long, Long)].collect().toSeq.sorted
    // reference: plain theta join on the same window
    val expect = left.as("l").join(right.as("r"),
      col("l.user_id") === col("r.user_id") &&
        col("r.ts").cast("long").between(
          col("l.ts").cast("long") + 1, col("l.ts").cast("long") + 3000))
      .select(col("l.event_id"), col("r.r_id"))
      .as[(Long, Long)].collect().toSeq.sorted
    assert(got == expect && got.nonEmpty)
    assert(got == got.distinct, "pair emitted more than once")
    // and on the real events table at sf0.001
    val e = Tables.events(spark, sf0001)
    val c = e.filter($"event_type" === "click")
      .select($"user_id", $"event_id", $"ts")
    val p = e.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("r_id"), $"ts")
    val fast = EventsOps.intervalJoin(c, p, "user_id", "ts", "ts", 0L, 600L)
      .select($"event_id", $"r_r_id").as[(Long, Long)].collect().toSeq.sorted
    val ref = c.as("l").join(p.as("r"),
      col("l.user_id") === col("r.user_id") &&
        unix_micros(col("r.ts")).between(unix_micros(col("l.ts")),
          unix_micros(col("l.ts")) + 600000000L))
      .select(col("l.event_id"), col("r.r_id"))
      .as[(Long, Long)].collect().toSeq.sorted
    assert(fast == ref)
    // scale shape: equi-join, not a broadcast-nested-loop per key
    val plan = EventsOps.intervalJoin(c, p, "user_id", "ts", "ts", 0L, 600L)
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"range join planned as a cross product:\n$plan")
  }

  test("streaming: same EventsOps code under readStream") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream")
    planted.write.mode("overwrite").parquet(dir.toString + "/in")
    val stream = spark.readStream
      .schema(planted.schema)
      .parquet(dir.toString + "/in")
      .withWatermark("ts", "1 hour")
    val q = EventsOps.tumbling(stream, "1 hour")
      .writeStream.outputMode("complete")
      .format("memory").queryName("graft_stream_test")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val got = spark.sql(
      "SELECT count(*) FROM graft_stream_test").head().getLong(0)
    assert(got == 3)
  }

  test("funnel: strict ordering gates each step") {
    val ev = Seq(
      // completes view -> click -> purchase in order
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:05:00"), "click"),
      (1L, ts("2024-01-01 10:10:00"), "purchase"),
      // click BEFORE first view: reaches step 0 only
      (2L, ts("2024-01-01 09:00:00"), "click"),
      (2L, ts("2024-01-01 09:30:00"), "view"),
      // skips click: purchase doesn't count without it
      (3L, ts("2024-01-01 08:00:00"), "view"),
      (3L, ts("2024-01-01 08:30:00"), "purchase"),
      // click at the SAME instant as view: strict > excludes it
      (4L, ts("2024-01-01 07:00:00"), "view"),
      (4L, ts("2024-01-01 07:00:00"), "click"),
      // never views
      (5L, ts("2024-01-01 06:00:00"), "purchase"),
    ).toDF("user_id", "ts", "event_type")
    val got = EventsOps.funnel(ev, Seq("view", "click", "purchase"))
      .orderBy("step").as[(Int, String, Long)].collect().toSeq
    assert(got == Seq(
      (0, "view", 4L), (1, "click", 1L), (2, "purchase", 1L)))
  }

  test("retention: epoch-week cohorts and offsets") {
    def atWeek(w: Long, off: Long = 0L) =
      new Timestamp((w * 604800L + off) * 1000L)
    val base = ts("2024-01-01 00:00:00").getTime / 1000 / 604800
    val ev = Seq(
      // user 1: cohort `base`, active weeks base and base+2
      (1L, atWeek(base)), (1L, atWeek(base, 3600)),
      (1L, atWeek(base + 2)),
      // user 2: cohort base+1
      (2L, atWeek(base + 1, 60)),
      // user 3: cohort base, active base+2 as well
      (3L, atWeek(base, 7200)), (3L, atWeek(base + 2, 99)),
    ).toDF("user_id", "ts")
    val got = EventsOps.retention(ev)
      .orderBy("cohort_week", "week_offset")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (base, 0L, 2L), (base, 2L, 2L), (base + 1, 0L, 1L)))
  }
}
