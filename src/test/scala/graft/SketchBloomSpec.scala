package graft

import org.apache.spark.sql.functions._

import graft.ext.{Bloom, Similarity, Sketches, TextStats}

/** Bloom join pruning, Misra–Gries heavy hitters, collocations, and the
  * at-rest IVF index — the round-5 additions.
  */
class SketchBloomSpec extends SparkSpec {

  test("bloom filter: zero false negatives, bounded false positives") {
    val s = spark; import s.implicits._
    val dim = (0L until 1000L).toDF("k")
    val bf = Bloom.buildFilter(dim, col("k"), expectedItems = 1000, fpp = 0.03)
    val hits = (0L until 5000L).toDF("k")
      .filter(Bloom.mightContain(bf, col("k")))
      .as[Long].collect().toSet
    assert((0L until 1000L).forall(hits), "bloom dropped a present key")
    val fp = hits.count(_ >= 1000L)
    assert(fp < 400, s"false-positive rate implausibly high: $fp/4000")
  }

  test("prunedJoin is result-identical to the plain join") {
    val dim = graft.Tables.customer(spark, sf0001)
      .filter(col("c_mktsegment") === "BUILDING")
    val fact = graft.Tables.orders(spark, sf0001)
    val pruned = Bloom.prunedJoin(fact, dim, "o_custkey", "c_custkey",
      expectedItems = 10000)
      .select("o_orderkey").collect().map(_.getLong(0)).sorted.toSeq
    val plain = fact.join(dim, fact("o_custkey") === dim("c_custkey"))
      .select("o_orderkey").collect().map(_.getLong(0)).sorted.toSeq
    assert(pruned == plain)
    assert(pruned.nonEmpty)
  }

  test("empty dim side yields a rejects-everything filter, not a crash") {
    val s = spark; import s.implicits._
    val dim = Seq.empty[Long].toDF("k")
    val bf = Bloom.buildFilter(dim, col("k"), expectedItems = 10)
    val n = (0L until 100L).toDF("k")
      .filter(Bloom.mightContain(bf, col("k"))).count()
    assert(n == 0)
  }

  // term i of t01..t40 appears i*i times → n = 22140; capacity 32 < 40
  // distinct terms, so the sketch must actually decrement and trim
  private def skewedTerms = {
    val s = spark; import s.implicits._
    (1 to 40).flatMap(i => Seq.fill(i * i)(f"t$i%02d")).toDF("term")
  }

  test("heavyHitters == exact GROUP BY ... HAVING under tight capacity") {
    val df = skewedTerms
    val got = Sketches.heavyHitters(df, col("term"), minCount = 700,
      capacity = 32).collect().map(r => (r.getString(0), r.getLong(1))).sorted
    val want = df.groupBy("term").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 700)
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted
    assert(got.sameElements(want))
    assert(want.length == 14) // i >= 27
  }

  test("heavyHittersFrac == exact share threshold") {
    val df = skewedTerms
    val got = Sketches.heavyHittersFrac(df, col("term"), invPhi = 32)
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted
    val n = 22140L
    val want = df.groupBy("term").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= n / 32 + 1)
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted
    assert(got.sameElements(want))
  }

  test("heavyHitters refuses a minCount below the completeness bound") {
    intercept[IllegalArgumentException] {
      Sketches.heavyHitters(skewedTerms, col("term"), minCount = 100,
        capacity = 32).collect()
    }
  }

  test("collocations matches a brute-force replay") {
    val s = spark; import s.implicits._
    val docs = Seq("a b a b c", "a b x", "c c c", "x").toDF("text")
    val got = TextStats.collocations(docs, col("text"), k = 10, minCount = 1)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    // brute force in plain Scala with the same association order
    val toksPerDoc = Seq("a b a b c", "a b x", "c c c", "x")
      .map(_.split("\\s+").toSeq)
    val uni = toksPerDoc.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val bigs = toksPerDoc.flatMap(t => t.zip(t.drop(1)))
    val nU = toksPerDoc.map(_.size).sum.toDouble
    val nB = bigs.size.toDouble
    val want = bigs.groupBy(identity).view.mapValues(_.size).toSeq
      .map { case ((w1, w2), c) =>
        val lift = c.toDouble * nU * nU / (nB * uni(w1) * uni(w2))
        (w1, w2, c.toLong, math.floor(lift * 1e6) / 1e6)
      }
      .sortBy { case (w1, w2, _, l) => (-l, w1, w2) }
      .take(10)
    assert(got.toSeq == want)
  }

  test("ivfTopKAtRest returns exactly ivfTopK's results") {
    val emb = graft.Tables.embeddings(spark, sf0001)
    val cents = Similarity.seedCentroids(emb, "vec_id", "embedding", 16)
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_spec_ivf/emb"
    Similarity.writeIvf(emb, "vec_id", "embedding", path, cents)
    val atRest = Similarity.ivfTopKAtRest(spark, path, "vec_id",
      "embedding", 3L, 10, cents, nProbe = 3).collect().map(_.toString).toSeq
    val inMem = Similarity.ivfTopK(emb, "vec_id", "embedding", 3L, 10,
      cents, nProbe = 3).collect().map(_.toString).toSeq
    assert(atRest == inMem)
    assert(atRest.nonEmpty)
  }
}
