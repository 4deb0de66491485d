package graft

import org.apache.spark.sql.functions._

/** Round-12 pins: the antipodal-free RP family's graded consequences,
  * the representative-based (linear-output) embedding dedup shape,
  * knnJoin's plan-literal centroid bound and broadcast-proof exchange,
  * and the stateful streaming jobs' full-precision in-batch ordering.
  */
class Round12Spec extends SparkSpec {
  import spark.implicits._

  // ---- local replicas of the portable kernels (independent of the
  // ---- Spark expressions they verify) ----

  /** rpDot's family, reconstructed: w(i) = ((i·(1+j%3) + (j/3)%7) % 7) − 3. */
  private def rpWeights(j: Int, dim: Int): Array[Double] = {
    val (a, b) = (1 + j % 3, (j / 3) % 7)
    Array.tabulate(dim)(i => (((i * a + b) % 7) - 3).toDouble)
  }

  /** The same left-to-right sequential double fold as VecDot. */
  private def dotL2R(x: Array[Float], w: Array[Double]): Double = {
    var acc = 0.0; var i = 0
    while (i < x.length) { acc += x(i).toDouble * w(i); i += 1 }
    acc
  }

  private def dotFF(x: Array[Float], y: Array[Float]): Double = {
    var acc = 0.0; var i = 0
    while (i < x.length) { acc += x(i).toDouble * y(i).toDouble; i += 1 }
    acc
  }

  private def localBucket(v: Array[Float], nBits: Int): Long =
    (0 until nBits).map { j =>
      if (dotL2R(v, rpWeights(j, v.length)) > 0) 1L << j else 0L
    }.reduce(_ | _)

  // ---- embeddingDedupGroups: linear output, exact rep assignment ----

  test("embeddingDedupGroups emits exactly one row per item whose " +
      "group_rep is the bucket's min id iff the cosine to it clears " +
      "the threshold (independent local replica), and zero vectors " +
      "keep themselves with NULL cos6") {
    val rnd = new scala.util.Random(12)
    val dim = 8
    val base = (0 until 60).map { k =>
      (k.toLong, Array.fill(dim)(rnd.nextFloat() * 2f - 1f))
    }
    // near-dups of the first few ids (tiny jitter -> same bucket,
    // cosine ~1) plus one zero vector
    val dups = (0 until 10).map { k =>
      (100L + k, base(k)._2.map(x => x * 1.0001f))
    }
    val rows = base ++ dups :+ (999L, Array.fill(dim)(0f))
    val df = rows.toDF("id", "vec")
    val thr = 0.9
    val out = graft.ext.Dedup
      .embeddingDedupGroups(df, "id", "vec", thr, nBits = 8)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .toMap
    assert(out.size === rows.size, "not one row per item")
    // independent replica of the whole rule
    val byBucket = rows.groupBy { case (_, v) => localBucket(v, 8) }
    for ((_, ms) <- byBucket) {
      val rep = ms.minBy(_._1)
      for ((id, v) <- ms) {
        val nv = math.sqrt(dotFF(v, v))
        val nr = math.sqrt(dotFF(rep._2, rep._2))
        val cos6 =
          if (nv > 0 && nr > 0)
            Some(math.floor(dotFF(v, rep._2) / (nv * nr) * 1e6).toLong)
          else None
        val expectRep =
          if (cos6.exists(_ >= math.floor(thr * 1e6).toLong)) rep._1 else id
        assert(out(id) === ((expectRep, cos6)),
          s"id $id: got ${out(id)}, expected ($expectRep, $cos6)")
      }
    }
    // fixture sanity: at least one planted near-dup adopted a
    // representative (not all — a lower-id random vector landing in a
    // dup's bucket becomes a low-cosine rep, and the dup then keeps
    // itself: exactly the documented representative-dedup semantics,
    // which the replica loop above verified case by case); the zero
    // vector kept itself with NULL cos6
    assert((0 until 10).exists(k => out(100L + k)._1 != 100L + k),
      "no planted near-dup adopted a representative")
    assert(out(999L) === ((999L, None)))
  }

  test("dedupGroupsMedia output is linear in the media count while the " +
      "pair query's output is not bounded by it") {
    // same kind (doc_id % 3 == 1 -> audio, single whole-content
    // frame) so identical text means identical frame-0 features;
    // mixing kinds would window the bytes differently per kind
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "en", "web", 43L),
      (4L, "the quick brown fox jumps over the lazy dog", "en", "web", 43L),
      (7L, "the quick brown fox jumps over the lazy dog", "en", "web", 43L),
      (10L, "completely different content with other bytes!", "en", "web", 46L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val media = graft.ext.Multimodal.syntheticMedia(spark, docs)
    val groups = graft.ext.Multimodal
      .dedupGroupsMedia(media, threshold = 0.9, nBits = 8).collect()
    assert(groups.length === 4, "one row per media item")
    // identical bytes -> identical features -> same bucket, cos = 1:
    // 4 and 7 adopt 1
    val g = groups.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(g(4L) === 1L && g(7L) === 1L)
    assert(g(1L) === 1L)
  }

  // ---- knnJoin: loud plan-literal centroid bound, no broadcast ----

  test("knnJoin refuses more than 65536 plan-literal centroids with " +
      "the broadcast-table guidance") {
    val df = Seq((1L, Array(1f, 0f))).toDF("id", "v")
    val cents = Seq.fill(65537)(Array(1f, 0f))
    val boom = intercept[IllegalArgumentException] {
      graft.ext.Similarity.knnJoin(df, "id", "v", k = 1, cents, nProbe = 1)
    }
    assert(boom.getMessage.contains("65536"))
    assert(boom.getMessage.contains("broadcast"))
  }

  test("knnJoin's cell join never broadcasts either side — the plan " +
      "that OOM'd an 8g driver at the r11 30x probe is unreachable") {
    val rnd = new scala.util.Random(7)
    val df = (0 until 200).map(i =>
      (i.toLong, Array.fill(8)(rnd.nextFloat()))).toDF("id", "v")
    val cents = graft.ext.Similarity.seedCentroids(df, "id", "v", 4)
    val res = graft.ext.Similarity.knnJoin(df, "id", "v", k = 2,
      cents, nProbe = 2)
    res.collect() // finalize the AQE plan
    val p = res.queryExecution.executedPlan.toString()
    assert(!p.contains("BroadcastHashJoin"),
      s"cell join got broadcast:\n$p")
    assert(p.contains("ShuffledHashJoin"),
      s"expected a shuffled hash cell join in:\n$p")
  }

  // ---- stateful streaming: sub-millisecond in-batch ordering ----

  test("transitionsStream orders same-millisecond in-batch events by " +
      "the full-microsecond instant, not by event_id (batch drive of " +
      "the state function)") {
    import graft.streaming.StreamingJobs.Event
    // one user, one batch: the FIRST event in time has the LARGER id
    // and the two events differ only below the millisecond — a
    // (getTime, event_id) key would invert them
    val ds = Seq(
      Event(5L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00.000200"),
        1L, "x", 1.0),
      Event(2L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00.000800"),
        1L, "y", 1.0)).toDS()
    val pairs = graft.streaming.StreamingJobs.transitionsStream(ds)
      .collect().map(p => (p.prev_type, p.next_type)).toSeq
    assert(pairs === Seq(("x", "y")),
      s"sub-millisecond order lost: $pairs")
  }

  test("evKey floors pre-epoch instants: -500 ms sorts BEFORE +200 ms " +
      "(truncating division paired them into the same second and " +
      "inverted the pair)") {
    import graft.streaming.StreamingJobs.Event
    val before = new java.sql.Timestamp(-500L) // 1969-12-31 23:59:59.5
    val after = new java.sql.Timestamp(200L)   // 1970-01-01 00:00:00.2
    val ds = Seq(
      Event(9L, after, 1L, "late", 1.0),
      Event(1L, before, 1L, "early", 1.0)).toDS()
    val pairs = graft.streaming.StreamingJobs.transitionsStream(ds)
      .collect().map(p => (p.prev_type, p.next_type)).toSeq
    assert(pairs === Seq(("early", "late")),
      s"pre-epoch order lost: $pairs")
  }

  // ---- IvfKernel: O(1)-codegen cell/probe == the expression tree ----

  test("IvfKernel cell and probes are bit-identical to the pre-r12 " +
      "expression-tree forms at a Janino-breaking 200-cell nlist " +
      "(the tree form inlined O(nCells*dim) generated code and fell " +
      "out of whole-stage codegen at 120 cells)") {
    import graft.functions.{IvfFunctions, VectorFunctions}
    val rnd = new scala.util.Random(84)
    val dim = 64
    val nCells = 200
    val nProbe = 5
    val cents: Seq[Array[Float]] =
      Seq.fill(nCells)(Array.fill(dim)(rnd.nextFloat() * 2f - 1f))
    val df = Seq.fill(300)(Array.fill(dim)(rnd.nextFloat() * 2f - 1f))
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
    // the EXACT tree ivfCell/knnJoin used before r12
    def sqTree(v: org.apache.spark.sql.Column, c: Array[Float]) = {
      val cc = { var a = 0.0; var i = 0
        while (i < c.length) { a += c(i).toDouble * c(i).toDouble; i += 1 }
        a }
      VectorFunctions.vecDot(v, v) -
        lit(2.0) * VectorFunctions.vecDot(v, lit(c)) + lit(cc)
    }
    val dTree = array(cents.map(c => sqTree(col("v"), c)): _*)
    val cellTree = (array_position(dTree, array_min(dTree)) - 1)
      .cast("int")
    val sTree = array(cents.zipWithIndex.map { case (c, i) =>
      struct(sqTree(col("v"), c).as("d"), lit(i).cast("int").as("i"))
    }: _*)
    val probesTree = transform(slice(array_sort(sTree), 1, nProbe),
      s => s.getField("i"))
    val kern = IvfFunctions.kernel(cents)
    val got = df.select(col("id"),
        IvfFunctions.cellOf(col("v"), kern).as("cell_k"),
        cellTree.as("cell_t"),
        IvfFunctions.probesOf(col("v"), kern, nProbe).as("p_k"),
        probesTree.as("p_t"))
      .collect()
    got.foreach { r =>
      assert(r.getInt(1) == r.getInt(2),
        s"cell mismatch at id ${r.getLong(0)}")
      assert(r.getSeq[Int](3) == r.getSeq[Int](4),
        s"probe mismatch at id ${r.getLong(0)}")
    }
  }

  test("two-level (hier) assignment: probe lists are valid and " +
      "distinct, assignment recall vs flat argmin is high on " +
      "CLUSTERED data (the real IVF regime), the hier kNN join " +
      "recovers most exact-join edges, and evaluation is " +
      "deterministic") {
    import graft.functions.IvfFunctions
    val rnd = new scala.util.Random(1212)
    val dim = 16
    val nCells = 100
    val cents: Seq[Array[Float]] =
      Seq.fill(nCells)(Array.fill(dim)(rnd.nextFloat() * 2f - 1f))
    val kern = IvfFunctions.kernel(cents)
    // CLUSTERED vectors — the real IVF regime (centroids come from
    // k-means on the data, so data concentrates around them); on
    // uniform-random data the nearest super barely predicts the
    // nearest cell and two-level recall collapses toward chance —
    // that regime is documented, not contracted.
    val vecs = (0 until 400).map { i =>
      val c = cents(rnd.nextInt(nCells))
      (i.toLong, c.map(x => x + (rnd.nextFloat() - 0.5f) * 0.3f))
    }
    val df = vecs.toDF("id", "v")
    val both = df.select(col("id"),
        IvfFunctions.cellOf(col("v"), kern).as("flat"),
        IvfFunctions.cellOf(col("v"), kern, hier = true).as("hier"),
        IvfFunctions.probesOf(col("v"), kern, 5, hier = true).as("ph"))
      .collect()
    // hier probe list always has nProbe entries, all valid distinct
    // cell ids. (Its head may legitimately BEAT cellHier's assignment:
    // probesHier pools >= 2 supers while cellHier scans one, so the
    // probe side has strictly better recall by construction.)
    both.foreach { r =>
      val ph = r.getSeq[Int](3)
      assert(ph.length == 5 && ph.forall(c => c >= 0 && c < nCells))
      assert(ph.distinct.length == ph.length)
    }
    // recall: the approximate contract must hold meaningfully —
    // two-level argmin matches flat argmin on a strong majority of
    // random vectors (seeded, deterministic)
    val agree = both.count(r => r.getInt(1) == r.getInt(2))
    assert(agree >= both.length * 0.7,
      s"hier assignment recall too low: $agree/${both.length}")
    // end-to-end: hier kNN join recovers most exact-join edges
    val exact = graft.ext.Similarity
      .knnJoin(df, "id", "v", k = 3, cents, nProbe = 3)
      .select("q_id", "n_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val hier = graft.ext.Similarity
      .knnJoin(df, "id", "v", k = 3, cents, nProbe = 3, hier = true)
      .select("q_id", "n_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & hier).size.toDouble / exact.size
    assert(recall >= 0.6,
      f"hier kNN edge recall $recall%.2f below the contract floor")
    // determinism: a second evaluation is identical
    val again = df.select(
        IvfFunctions.cellOf(col("v"), kern, hier = true)).collect()
      .map(_.getInt(0)).toSeq
    assert(again == both.map(_.getInt(2)).toSeq)
  }

  test("probesHier fallback: when the top-2 supers cannot fill nProbe, " +
      "the walk extends nearest-first and still returns nProbe valid " +
      "distinct cells") {
    import graft.functions.IvfFunctions
    val rnd = new scala.util.Random(77)
    val dim = 8
    // 9 cells -> ceil(sqrt(9)) = 3 supers of ~3 members each: nProbe=8
    // exceeds any two supers' pool, forcing the nearest-first fallback
    val cents: Seq[Array[Float]] =
      Seq.fill(9)(Array.fill(dim)(rnd.nextFloat() * 2f - 1f))
    val kern = IvfFunctions.kernel(cents)
    val df = Seq.fill(50)(Array.fill(dim)(rnd.nextFloat() * 2f - 1f))
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val got = df.select(
        IvfFunctions.probesOf(col("v"), kern, 8).as("p")).collect()
    got.foreach { r =>
      val p = r.getSeq[Int](0)
      assert(p.length == 8, s"fallback under-filled: $p")
      assert(p.distinct.length == 8 && p.forall(c => c >= 0 && c < 9))
    }
  }

  // ---- q225: outer-join delayed nulls, proven non-vacuous ----

  test("q225 outer stream join: null rows emit for unmatched purchases " +
      "below the final global watermark, and unmatched purchases ABOVE " +
      "it are held in state and absent — both branches non-vacuous") {
    val d = sf0001
    val graded =
      SparkEntry.queries("q225_stream_outer_join")(spark, d).collect()
    val ev = Tables.events(spark, d)
      .select("event_id", "ts", "user_id", "event_type", "value")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
    val wm = new java.sql.Timestamp(math.min(
      p.agg(max("p_ts")).head.getTimestamp(0).getTime,
      c.agg(max("c_ts")).head.getTimestamp(0).getTime) - 3600000L)
    val unmatched = p.join(c,
        col("user_id") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
          col("c_ts") < col("p_ts"),
        "left_anti")
    val heldAbove = unmatched.filter(col("p_ts") >= lit(wm)).count()
    val nullRows = graded.count(_.isNullAt(3))
    assert(nullRows > 0, "no delayed null emissions — branch vacuous")
    assert(heldAbove > 0,
      "no unmatched purchase above the watermark — absence untested")
    // the held purchases are genuinely absent from the graded output
    val gradedNullKeys = graded.filter(_.isNullAt(3))
      .map(r => (r.getLong(0), r.getTimestamp(1))).toSet
    val heldKeys = unmatched.filter(col("p_ts") >= lit(wm))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1))).toSet
    assert(gradedNullKeys.intersect(heldKeys).isEmpty,
      "a held-in-state purchase leaked a null emission")
  }

  // ---- q224: the DROP branch of withWatermark, proven dropped ----

  test("q224 late-bucket replay drops EXACTLY the late bucket: graded " +
      "result == batch tumbling counts minus bucket 3, and differs " +
      "from the no-watermark batch twin (the drop really happened)") {
    val d = sf0001
    val graded =
      SparkEntry.queries("q224_stream_late_drop")(spark, d).collect()
    val ev = Tables.events(spark, d)
    val b = ev.agg(min(unix_micros(col("ts"))).as("lo"),
      max(unix_micros(col("ts"))).as("hi")).head
    val (lo, hi) = (b.getLong(0), b.getLong(1))
    val bucket =
      expr(s"(unix_micros(ts) - ${lo}L) * 6 div ${hi - lo + 1}L")
    def hourly(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(date_trunc("hour", col("ts")).as("window_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .orderBy("window_start", "event_type")
    // the late bucket is non-empty — the drop branch was exercised,
    // not vacuously skipped
    val nLate = ev.filter(bucket === 3).count()
    assert(nLate > 0, "bucket 3 empty: late-drop replay proves nothing")
    val withoutLate = hourly(ev.filter(bucket =!= 3)).collect()
    assert(graded.toSeq == withoutLate.toSeq,
      "graded stream result != batch twin minus the late bucket")
    val full = hourly(ev).collect()
    assert(graded.map(_.getLong(2)).sum ==
      full.map(_.getLong(2)).sum - nLate,
      "late rows were not all dropped by the watermark")
  }
}
