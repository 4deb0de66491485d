package graft

import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Stats}

/** Round-6 operators: sorted-neighborhood blocking, survivorship merge,
  * exact two-sample KS, equi-width histograms, classifier evaluation.
  * Each checked against a hand-computed or driver-side reference.
  */
class Round6Spec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------------
  // Stats.ksDrift
  // ------------------------------------------------------------------

  test("ksDrift: hand-computed two-sample KS distance") {
    // a = {1,2,2,3}, b = {2,3,3,4}
    // distinct v: 1,2,3,4; Fa = 1/4, 3/4, 4/4, 4/4; Fb = 0, 1/4, 3/4, 4/4
    // gaps: 1/4, 2/4, 1/4, 0  →  D = 1/2, d_num = |3*4 - 1*4| = 8
    val a = Seq(1, 2, 2, 3).toDF("v")
    val b = Seq(2, 3, 3, 4).toDF("v")
    val r = Stats.ksDrift(a, b, col("v")).head()
    assert(r.getLong(0) === 4L && r.getLong(1) === 4L)
    assert(r.getLong(2) === 8L)
    assert(r.getDouble(3) === 0.5)
  }

  test("ksDrift: identical samples give zero distance") {
    val a = Seq(5, 6, 7).toDF("v")
    val r = Stats.ksDrift(a, a, col("v")).head()
    assert(r.getLong(2) === 0L && r.getDouble(3) === 0.0)
  }

  test("ksDrift: disjoint supports give distance 1") {
    val a = Seq(1, 2).toDF("v")
    val b = Seq(10, 11).toDF("v")
    val r = Stats.ksDrift(a, b, col("v")).head()
    assert(r.getDouble(3) === 1.0)
  }

  // ------------------------------------------------------------------
  // Stats.equiWidthHist
  // ------------------------------------------------------------------

  test("equiWidthHist: exact integer bucketing, min/max rows land inside") {
    // g1: values 0..9, k=5 over span 10 → width 2, buckets 0..4, 2 each
    val df = (0 until 10).map(v => ("g1", v)).toDF("g", "v")
    val out = Stats.equiWidthHist(df, "g", col("v"), 5)
      .orderBy("bucket").collect()
    assert(out.map(_.getLong(1)).toSeq === Seq(0L, 1L, 2L, 3L, 4L))
    assert(out.map(_.getLong(3)).toSeq === Seq(2L, 2L, 2L, 2L, 2L))
    assert(out.map(_.getLong(2)).toSeq === Seq(0L, 2L, 4L, 6L, 8L))
    // max value maps to the LAST bucket, never k
    assert(out.forall(r => r.getLong(1) < 5))
  }

  test("equiWidthHist: constant column collapses to one bucket") {
    val df = Seq(("g", 7), ("g", 7), ("g", 7)).toDF("g", "v")
    val out = Stats.equiWidthHist(df, "g", col("v"), 10).collect()
    assert(out.length === 1)
    assert(out.head.getLong(1) === 0L && out.head.getLong(3) === 3L)
  }

  // ------------------------------------------------------------------
  // Stats.classifierEval
  // ------------------------------------------------------------------

  test("classifierEval: tp/fp/fn and exact ratio truncation") {
    // guess/truth pairs: (a,a) x2, (a,b) x1, (b,b) x1, (c,b) x1
    val df = Seq(("a", "a"), ("a", "a"), ("a", "b"), ("b", "b"),
      ("c", "b")).toDF("g", "t")
    val out = Stats.classifierEval(df, col("g"), col("t"))
      .orderBy("cls").collect()
    val byCls = out.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(byCls("a") === ((2L, 1L, 0L))) // tp=2 fp=1 fn=0
    assert(byCls("b") === ((1L, 0L, 2L)))
    assert(byCls("c") === ((0L, 1L, 0L)))
    val a = out.find(_.getString(0) == "a").get
    assert(a.getLong(4) === 666666L) // prec = 2/3 truncated
    assert(a.getLong(5) === 1000000L) // rec = 2/2
    assert(a.getLong(6) === 800000L) // f1 = 4/5
    // class c: tp=0, fn=0 → recall denominator 0 → null
    val c = out.find(_.getString(0) == "c").get
    assert(c.isNullAt(5))
  }

  test("classifierEval: class axis is the union of guessed and true labels") {
    // 'x' only guessed, 'y' only true
    val df = Seq(("x", "y")).toDF("g", "t")
    val out = Stats.classifierEval(df, col("g"), col("t"))
    assert(out.select("cls").as[String].collect().toSet === Set("x", "y"))
  }

  // ------------------------------------------------------------------
  // Dedup.sortedNeighborhood
  // ------------------------------------------------------------------

  test("sortedNeighborhood: pairs only within the window, exact Jaccard gate") {
    // one block; order by len: d1(10) d2(11) d3(12) d4(100); w=2 pairs
    // only adjacent in sort order: (1,2) (2,3) (3,4)
    val df = Seq(
      (1L, "a b c", "en", 10L), (2L, "a b c", "en", 11L),
      (3L, "a b x", "en", 12L), (4L, "p q r", "en", 100L)
    ).toDF("doc_id", "text", "lang", "n_chars")
    val out = Dedup.sortedNeighborhood(df, "doc_id", "text",
      "lang", "n_chars", w = 2, tauNum = 1, tauDen = 2)
      .orderBy("a_id", "b_id").collect()
    // (1,2): J=3/3 keep; (2,3): J=2/4 keep at tau=1/2; (3,4): J=0 drop
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((1L, 2L), (2L, 3L)))
    assert(out.head.getLong(2) === 3L && out.head.getLong(3) === 3L)
  }

  test("sortedNeighborhood: blocks never pair across the block key") {
    val df = Seq(
      (1L, "a b", "en", 10L), (2L, "a b", "fr", 10L)
    ).toDF("doc_id", "text", "lang", "n_chars")
    val out = Dedup.sortedNeighborhood(df, "doc_id", "text",
      "lang", "n_chars", w = 5, tauNum = 0, tauDen = 1)
    assert(out.count() === 0L)
  }

  test("sortedNeighborhood: w widens the neighborhood") {
    val df = Seq(
      (1L, "a b", "en", 1L), (2L, "a b", "en", 2L), (3L, "a b", "en", 3L)
    ).toDF("doc_id", "text", "lang", "n_chars")
    val w2 = Dedup.sortedNeighborhood(df, "doc_id", "text",
      "lang", "n_chars", 2, 0, 1).count()
    val w3 = Dedup.sortedNeighborhood(df, "doc_id", "text",
      "lang", "n_chars", 3, 0, 1).count()
    assert(w2 === 2L && w3 === 3L)
  }

  // ------------------------------------------------------------------
  // Dedup.survivorship
  // ------------------------------------------------------------------

  test("survivorship: mode with count-desc value-asc tie-break, max, min id") {
    // cluster key: constant → one cluster of 4
    val df = Seq(
      (7L, "en", "s2", 10L), (3L, "fr", "s1", 40L),
      (5L, "en", "s2", 30L), (9L, "de", "s1", 20L)
    ).toDF("doc_id", "lang", "source", "n_chars")
    val out = Dedup.survivorship(df, "doc_id", lit("k"),
      Seq("lang", "source"), Seq("n_chars")).head()
    assert(out.getAs[Long]("canonical_id") === 3L)
    assert(out.getAs[Long]("n_members") === 4L)
    assert(out.getAs[Long]("max_n_chars") === 40L)
    assert(out.getAs[String]("mode_lang") === "en") // 2 en > 1 fr,de
    // source: s1 x2, s2 x2 → tie → lexicographically smallest
    assert(out.getAs[String]("mode_source") === "s1")
  }

  test("survivorship: singleton clusters pass fields through") {
    val df = Seq((1L, "en", "s", 5L), (2L, "fr", "t", 6L))
      .toDF("doc_id", "lang", "source", "n_chars")
    val out = Dedup.survivorship(df, "doc_id", col("doc_id").cast("string"),
      Seq("lang"), Seq("n_chars")).orderBy("canonical_id").collect()
    assert(out.map(_.getAs[String]("mode_lang")).toSeq === Seq("en", "fr"))
    assert(out.map(_.getAs[Long]("n_members")).toSeq === Seq(1L, 1L))
  }
}
