package graft

import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Linkage, Quality}
import graft.ext.Linkage.FieldWeight

/** Round-7 operators: Fellegi-Sunter record linkage, k-anonymity /
  * l-diversity audit, containment near-dups. Hand-computed references.
  */
class Round7Spec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------------
  // Linkage.neighborhoodPairs
  // ------------------------------------------------------------------

  test("neighborhoodPairs: linear candidate count, order-respecting") {
    // one block of 5 ordered rows, w=3 → each row pairs with next 2:
    // (1,2),(1,3),(2,3),(2,4),(3,4),(3,5),(4,5) = 2n-3 pairs
    val df = Seq((1L, "b", 10.0), (2L, "b", 20.0), (3L, "b", 30.0),
      (4L, "b", 40.0), (5L, "b", 50.0)).toDF("id", "blk", "ord")
    val pairs = Linkage.neighborhoodPairs(df, "id", "blk", "ord", 3)
      .as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L),
      (3L, 4L), (3L, 5L), (4L, 5L)))
  }

  test("neighborhoodPairs: blocks never pair across") {
    val df = Seq((1L, "x", 1.0), (2L, "x", 2.0),
      (3L, "y", 1.0), (4L, "y", 2.0)).toDF("id", "blk", "ord")
    val pairs = Linkage.neighborhoodPairs(df, "id", "blk", "ord", 4)
      .as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L), (3L, 4L)))
  }

  // ------------------------------------------------------------------
  // Linkage.fellegiSunter
  // ------------------------------------------------------------------

  test("fellegiSunter: integer weights, null fields contribute zero") {
    // 1-2 agree on both fields (link); 2-4 disagree on both
    // (non_link); 3 has a NULL f2, so its pairs only count f1's
    // disagreement (0 for the null field → possible band).
    val df = Seq(
      (1L, "b", 1.0, "t1", Option("s1")),
      (2L, "b", 2.0, "t1", Option("s1")),
      (3L, "b", 3.0, "t2", None),
      (4L, "b", 4.0, "t9", Option("s9")))
      .toDF("id", "blk", "ord", "f1", "f2")
    val out = Linkage.fellegiSunter(df, "id", "blk", "ord", 3,
      Seq(FieldWeight("f1", 3000L, -2000L),
        FieldWeight("f2", 2000L, -1000L)),
      upperMb = 4000L, lowerMb = -2500L)
      .as[(Long, Long, Long, String)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(out((1L, 2L)) === (5000L, "link"))
    assert(out((1L, 3L)) === (-2000L, "possible"))
    assert(out((2L, 3L)) === (-2000L, "possible"))
    assert(out((2L, 4L)) === (-3000L, "non_link"))
    assert(out((3L, 4L)) === (-2000L, "possible"))
  }

  // ------------------------------------------------------------------
  // Quality.kAnonymityAudit
  // ------------------------------------------------------------------

  test("kAnonymityAudit: flags small and homogeneous classes only") {
    // class (a,1): 3 rows, 3 distinct sensitive → k-violation at k=4
    // class (a,2): 4 rows, 1 distinct → l-violation at l=2
    // class (b,1): 4 rows, 2 distinct → compliant, must NOT appear
    val df = Seq(
      ("a", 1, "s1"), ("a", 1, "s2"), ("a", 1, "s3"),
      ("a", 2, "x"), ("a", 2, "x"), ("a", 2, "x"), ("a", 2, "x"),
      ("b", 1, "p"), ("b", 1, "p"), ("b", 1, "q"), ("b", 1, "q"))
      .toDF("qi1", "qi2", "sens")
    val out = Quality.kAnonymityAudit(df, Seq("qi1", "qi2"),
      col("sens"), k = 4, l = 2)
      .as[(String, Int, Long, Long, Int, Int)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    assert(out.keySet === Set(("a", 1), ("a", 2)))
    assert(out(("a", 1)) === ((3L, 3L, 1, 0)))
    assert(out(("a", 2)) === ((4L, 1L, 0, 1)))
  }

  // ------------------------------------------------------------------
  // Dedup.containmentPairs
  // ------------------------------------------------------------------

  private val longDoc = (1 to 30).map(i => s"w$i").mkString(" ")
  // drop the last 4 tokens: shingle set is a strict subset of longDoc's
  private val subsetDoc = (1 to 26).map(i => s"w$i").mkString(" ")
  private val otherDoc = (1 to 30).map(i => s"z$i").mkString(" ")

  test("containmentPairs: subset doc scores full containment") {
    val df = Seq((1L, longDoc), (2L, subsetDoc), (3L, otherDoc))
      .toDF("doc_id", "text")
    val out = Dedup.containmentPairs(df, "doc_id", "text",
      n = 3, k = 8, bands = 4, tauNum = 3, tauDen = 4)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    val p = out.find(r => r._1 == 1L && r._2 == 2L)
    assert(p.nonEmpty, s"subset pair not found in ${out.toSeq}")
    // A ⊂ B → inter = |A|, containment exactly 1.0
    assert(p.get._5 === math.min(p.get._3, p.get._4))
    assert(p.get._6 === 1000000L)
    // the unrelated doc never pairs
    assert(out.forall(r => r._1 != 3L && r._2 != 3L))
  }

  test("containmentPairs: containment >= Jaccard on every emitted pair") {
    val docs = Seq(
      (1L, longDoc), (2L, subsetDoc),
      (3L, (5 to 30).map(i => s"w$i").mkString(" ")),
      (4L, (1 to 15).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Dedup.containmentPairs(docs, "doc_id", "text",
      n = 3, k = 8, bands = 4, tauNum = 0, tauDen = 1)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val jacc = r._5.toDouble / (r._3 + r._4 - r._5).toDouble
      assert(r._6.toDouble / 1e6 >= jacc - 1e-9,
        s"containment below jaccard on $r")
    }
  }

  test("containmentPairs: portable and fast banding agree on the verify") {
    val df = Seq((1L, longDoc), (2L, subsetDoc), (3L, otherDoc))
      .toDF("doc_id", "text")
    def run(portable: Boolean) =
      Dedup.containmentPairs(df, "doc_id", "text",
        n = 3, k = 8, bands = 4, tauNum = 3, tauDen = 4,
        portable = portable)
        .select("id_a", "id_b", "cont_ppm")
        .as[(Long, Long, Long)].collect().toSet
    // both hash families must find the fully-contained pair; the
    // verify stage is hash-independent so agreeing pairs agree on ppm
    val fast = run(portable = false); val port = run(portable = true)
    assert(fast.intersect(port).nonEmpty)
    assert((fast ++ port).forall(_._3 >= 750000L))
  }
}
