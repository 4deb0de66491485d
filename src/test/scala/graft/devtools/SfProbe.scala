package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev: the sf1.0 headroom probe — MEASURED wall-clock scaling of the
  * 10 slowest graded queries (per BENCH_r10) on replicated corpora at
  * 1×/3×/10× of sf0.1, i.e. up to the sf1.0 volume the 2×-of-baseline
  * gate has never been run at. Each query's fitted exponent
  * (least-squares slope of ln t over ln m) is the recorded evidence
  * for its 100×-scale claim: ~1 is linear, sub-linear means a
  * constant-sized component dominates, super-linear is a bug to fix
  * or a volume contract to document (BUILD_NOTES).
  *
  * Replication keeps per-replica STRUCTURE constant while volume
  * grows — the realistic scale-up, mirroring how TPC-H itself scales
  * (fact rows and entity counts grow with SF; enum domains like
  * p_brand stay fixed):
  *  - documents: ids shift 10^7 per replica; every token gets a
  *    per-replica suffix, so each replica reproduces the original's
  *    near-dup structure exactly while replicas share zero shingles
  *    (the ScaleProbe discipline — near-dup DENSITY constant).
  *  - customer: doubled-digit name suffix keeps cross-replica name
  *    pairs at edit distance >= 2, out of the d=1 join.
  *  - orders/lineitem/supplier/part: keys shift per replica, so the
  *    trade graph grows as 10 disjoint replica-components (more
  *    customers/suppliers at higher SF, same degree structure) and
  *    baskets grow 10× over the FIXED 25-brand item domain.
  *  - embeddings: ids shift, vectors copied — centroid cells grow
  *    10×, assignment structure unchanged.
  * Absolute-key filters inside the queries (q69/q183's doc_id<50
  * probe batch, q131/q146's <=2/<=5 sources) match only replica 0 —
  * deliberately: a constant probe batch / source set over a growing
  * corpus IS the realistic sf1.0 shape, and the measured cost is the
  * corpus-side scan/index/join work, which is the part that must stay
  * linear.
  *
  * `SPARK_GRAFT_CPUS=32 sbt "Test/runMain graft.SfProbe [mults...]"`
  * (default 1 3 10; m=1 reads sf0.1 in place).
  */
object SfProbe {

  /** BENCH_r10's 10 slowest graded queries (r10 verdict item 1). */
  val slowest: Seq[String] = Seq(
    "q194_winnow_matches", "q183_index_append", "q106_editdist_join",
    "q83_setsim_join", "q146_temporal_reach", "q131_bfs", "q136_lpa",
    "q207_assoc_rules", "q84_knn_join", "q69_incremental_dedup")

  def main(args: Array[String]): Unit = {
    val mults = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 3, 10)
    val spark = EntryKit.session()
    spark.sparkContext.setLogLevel("ERROR")
    val base = "/root/testdata/sf0.1"
    val work = java.nio.file.Files.createTempDirectory("graft_sf_probe")

    def shifted(df: DataFrame, m: Int)(
        replica: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until m).map(i => replica(df, i)).reduce(_ unionByName _)

    /** Write the 7 tables the slowest queries read, m-replicated with
      * key shifts, into a directory shaped like a testdata sf dir so
      * `SparkEntry.queries(name)(spark, dir)` runs unmodified.
      */
    def buildScaled(m: Int): String = {
      if (m == 1) return base
      val out = s"$work/x$m"
      def w(df: DataFrame, name: String): Unit =
        df.repartition(32).write.mode("overwrite")
          .parquet(s"$out/$name.parquet")
      // Two independent decorrelations per replica: the token suffix
      // makes SHINGLE spaces disjoint (text dedup sees replicas as
      // unrelated), and the per-replica letter rotation makes BYTE
      // DISTRIBUTIONS differ (the media ops' byte-correlation features
      // are robust to a suffix — without the rotation every replica of
      // a doc is a mutual near-dup and the near-dup OUTPUT itself
      // grows quadratically in m, drowning the operator's own cost).
      val az = "abcdefghijklmnopqrstuvwxyz"
      w(shifted(Tables.documents(spark, base), m) { (df, i) =>
        val rot = az.drop(i % 26) + az.take(i % 26)
        df.select((col("doc_id") + i * 10000000L).as("doc_id"),
          translate(
            regexp_replace(col("text"), "(\\S+)", s"$$1_$i"),
            az, rot).as("text"),
          col("lang"), col("source"), col("n_chars"))
      }, "documents")
      w(shifted(Tables.customer(spark, base), m) { (df, i) =>
        df.select((col("c_custkey") + i * 10000000L).as("c_custkey"),
          concat(col("c_name"), lit(s"_$i$i")).as("c_name"),
          col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"))
      }, "customer")
      w(shifted(Tables.orders(spark, base), m) { (df, i) =>
        df.select((col("o_orderkey") + i * 100000000L).as("o_orderkey"),
          (col("o_custkey") + i * 10000000L).as("o_custkey"),
          col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
          col("o_orderpriority"))
      }, "orders")
      w(shifted(Tables.lineitem(spark, base), m) { (df, i) =>
        df.select((col("l_orderkey") + i * 100000000L).as("l_orderkey"),
          (col("l_partkey") + i * 1000000L).as("l_partkey"),
          (col("l_suppkey") + i * 1000000L).as("l_suppkey"),
          col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
          col("l_discount"), col("l_tax"), col("l_returnflag"),
          col("l_linestatus"), col("l_shipdate"))
      }, "lineitem")
      w(shifted(Tables.supplier(spark, base), m) { (df, i) =>
        df.select((col("s_suppkey") + i * 1000000L).as("s_suppkey"),
          col("s_name"), col("s_nationkey"), col("s_acctbal"))
      }, "supplier")
      w(shifted(Tables.part(spark, base), m) { (df, i) =>
        df.select((col("p_partkey") + i * 1000000L).as("p_partkey"),
          col("p_name"), col("p_brand"), col("p_type"), col("p_size"),
          col("p_retailprice"))
      }, "part")
      w(shifted(Tables.embeddings(spark, base), m) { (df, i) =>
        df.select((col("vec_id") + i * 10000000L).as("vec_id"),
          col("embedding"), col("label"))
      }, "embeddings")
      // events: more users and events over the SAME time span (the
      // realistic sf growth — traffic densifies, the day doesn't get
      // longer); ids shift so replicas are disjoint user populations
      w(shifted(Tables.events(spark, base)
          .select("event_id", "ts", "user_id", "event_type", "value",
            "props"), m) { (df, i) =>
        df.select((col("event_id") + i * 10000000L).as("event_id"),
          col("ts"), (col("user_id") + i * 10000000L).as("user_id"),
          col("event_type"), col("value"), col("props"))
      }, "events")
      // fixed-size dims ride along unchanged
      w(Tables.region(spark, base), "region")
      w(Tables.nation(spark, base), "nation")
      out
    }

    val dirs = mults.map(m => m -> buildScaled(m)).toMap
    // (q84_knn_scaled — the derived-cell fix this probe first measured
    // in r11 — is a GRADED row since r12, so it comes from
    // SparkEntry.queries like everything else.)
    val extras: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      // knnJoin's second-order contract: with nCells ∝ n, FLAT
      // assignment is O(n·nlist) — the measured quadratic term past
      // ~60×. The two-level quantizer (hier = true) is the O(√nlist)
      // assignment path; this variant measures it under the same
      // derived-nCells rule as the graded q84_knn_scaled.
      "q84_knn_hier" -> ((s: SparkSession, dir: String) => {
        val emb = Tables.embeddings(s, dir)
        // EXACTLY the graded q84_knn_scaled rule (max(nProbe, n/100))
        // so the hier-vs-flat A/B compares the same nlist regime — the
        // first cut used n/500 and confounded the comparison (5×
        // bigger cells → 5× more candidates charged to hier)
        val nProbe = 3
        val nCells = math.max(nProbe, (emb.count() / 100L).toInt)
        val cents = graft.ext.Similarity.seedCentroids(
          emb, "vec_id", "embedding", nCells)
        graft.ext.Similarity.knnJoin(emb, "vec_id", "embedding", k = 3,
          cents, nProbe = nProbe, hier = true)
      }),
      // embeddingNearDups' contract: one extra sign-RP bit per corpus
      // doubling (constant target bucket size) — vs q39's fixed 8 bits
      "q39_media_scaled" -> ((s: SparkSession, dir: String) => {
        val docs = Tables.documents(s, dir)
        val nBits = math.min(graft.ext.Similarity.MaxRpBits, 8 + math.max(0,
          (math.log(docs.count() / 5000.0) / math.log(2)).ceil.toInt))
        graft.ext.Multimodal.nearDupMedia(
          graft.ext.Multimodal.syntheticMedia(s, docs),
          threshold = 0.9, nBits = nBits)
      }))
    // SPARK_GRAFT_PROBE_ONLY=all sweeps EVERY graded query (the
    // full-coverage headroom audit); a comma list filters; unset =
    // the 10 slowest + the scaled-kNN fix variant.
    val only = sys.env.get("SPARK_GRAFT_PROBE_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val qs =
      if (only.contains(Set("all")))
        SparkEntry.queries.toSeq.sortBy(_._1) ++ extras
      else {
        // a filter may name ANY graded query, not just the slowest-10
        val pool = (slowest ++ only.getOrElse(Set.empty))
          .distinct.filter(SparkEntry.queries.contains)
          .map(n => n -> SparkEntry.queries(n)) ++ extras
        pool.filter { case (n, _) => only.forall(_.contains(n)) }
      }
    val names = qs.map(_._1)

    // Bench's measurement discipline: clearCache before each sample,
    // count() action (consistent with every BENCH_r*.json), two
    // INTERLEAVED passes per multiplier, per-(query, m) minimum.
    // A query that dies at some multiplier (e.g. a broadcast outgrowing
    // the driver) reports -1 there instead of killing the probe — the
    // failure IS a scale finding and must land in the table.
    def once(n: String, fn: (SparkSession, String) => DataFrame,
        m: Int, dir: String): Double = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      try { fn(spark, dir).count() }
      catch { case e: Throwable =>
        println(s"!! $n at ${m}x: ${e.getClass.getSimpleName}: " +
          String.valueOf(e.getMessage).take(300))
        return -1.0
      }
      val t = (System.nanoTime() - t0) / 1e9
      println(f".. $n ${m}x $t%.2fs")
      t
    }
    // warmup: table footers + page cache at every multiplier
    dirs.values.foreach { d =>
      Tables.testdataNames.foreach(t => Tables.table(spark, d, t).count())
    }
    val samples: Map[(String, Int), Double] =
      (1 to 2).flatMap { _ =>
        mults.flatMap { m =>
          qs.map { case (n, fn) => (n, m) -> once(n, fn, m, dirs(m)) }
        }
      }.groupBy(_._1).map { case (k, v) =>
        val ok = v.map(_._2).filter(_ >= 0)
        k -> (if (ok.nonEmpty) ok.min else -1.0)
      }

    def fitExponent(ts: Seq[(Int, Double)]): Double = {
      if (ts.exists(_._2 < 0)) return Double.NaN
      val pts = ts.map { case (m, t) => (math.log(m), math.log(t)) }
      val n = pts.size
      val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
      val sxx = pts.map(p => p._1 * p._1).sum
      val sxy = pts.map(p => p._1 * p._2).sum
      (n * sxy - sx * sy) / (n * sxx - sx * sx)
    }

    println("| query | " + mults.map(m => s"${m}x sec").mkString(" | ") +
      " | exponent |")
    println("|---|" + mults.map(_ => "---|").mkString + "---|")
    val rows = names.map { n =>
      val ts = mults.map(m => m -> samples((n, m)))
      val e = fitExponent(ts)
      println(f"| $n | ${ts.map(t => f"${t._2}%.2f").mkString(" | ")} " +
        f"| $e%.2f |")
      (n, ts, e)
    }
    val json = rows.map { case (n, ts, e) =>
      // a failed multiplier (-1 sample) makes the fit NaN — emit null,
      // NaN is not valid JSON and the failure record is the one line
      // a consumer most needs to parse
      val eStr = if (e.isNaN) "null" else f"$e%.3f"
      EntryKit.jsonEscape(n) + ":{\"t\":[" +
        ts.map(t => f"${t._2}%.3f").mkString(",") +
        s"""],"exponent":$eStr}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"sf_scale_probe","unit":"sec","base":"$base",""" +
      s""""mults":[${mults.mkString(",")}],"queries":$json}""")
    spark.stop()
  }
}
