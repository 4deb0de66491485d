package graft

import org.apache.spark.sql.functions._

import graft.ext.{Clustering, Dedup, TextStats}

/** Integer-lattice k-means, SemDeDup pruning, BM25, and the
  * prefix-filtered exact set-similarity join: each checked against an
  * independent local (driver-side) reimplementation or a naive Spark
  * formulation.
  */
class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
  private lazy val docs = spark.read.parquet(s"$sf0001/documents.parquet")

  /** Driver-side reference Lloyd on the same lattice. */
  private def localKmeans(vecs: Seq[(Long, Array[Float])], k: Int,
      iters: Int): Map[Long, (Int, Long)] = {
    val q = vecs.sortBy(_._1).map { case (id, v) =>
      id -> v.map(x => math.floor(x.toDouble * 1024).toLong)
    }
    var cents = q.take(k).map(_._2.clone)
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def assign1(v: Array[Long]): (Int, Long) = {
      val ds = cents.map(c => d2(v, c))
      val m = ds.min
      (ds.indexOf(m), m)
    }
    for (_ <- 1 until iters) {
      val byC = q.groupBy { case (_, v) => assign1(v)._1 }
      cents = cents.zipWithIndex.map { case (prev, j) =>
        byC.get(j) match {
          case Some(members) =>
            val dim = prev.length
            Array.tabulate(dim) { d =>
              val s = members.map(_._2(d)).sum
              Math.floorDiv(s, members.size.toLong)
            }
          case None => prev
        }
      }
    }
    q.map { case (id, v) => id -> assign1(v) }.toMap
  }

  test("kmeansLattice matches a driver-side reference implementation") {
    val vecs = emb.select($"vec_id", $"embedding").as[(Long, Array[Float])]
      .collect().toSeq
    val expected = localKmeans(vecs, k = 4, iters = 3)
    val got = Clustering.kmeansLattice(emb, "vec_id", "embedding",
      k = 4, iters = 3)
      .as[(Long, Int, Long)].collect()
      .map { case (id, c, d) => id -> ((c, d)) }.toMap
    assert(got == expected)
  }

  test("kmeansLattice: a cluster that loses all members keeps its seed") {
    // two tight groups far apart + k=3: the third seed (inside group one)
    // goes empty after the first update and must not NPE or shift
    val df = Seq(
      (0L, Array(0.0f, 0.0f)), (1L, Array(0.01f, 0.0f)),
      (2L, Array(0.02f, 0.0f)),
      (10L, Array(10.0f, 10.0f)), (11L, Array(10.01f, 10.0f)))
      .toDF("id", "v")
    val out = Clustering.kmeansLattice(df, "id", "v", k = 3, iters = 3)
      .as[(Long, Int, Long)].collect()
      .map { case (id, c, _) => id -> c }.toMap
    // group one collapses onto clusters 0/1/2's centroid region; the far
    // group lands together on a single cluster
    assert(out(10L) == out(11L))
    assert(Set(out(0L), out(1L), out(2L)).forall(_ != out(10L)))
  }

  test("semanticDedup: impossible tau drops nothing, tau=-2 drops all but cluster minima") {
    assert(Clustering.semanticDedup(emb, "vec_id", "embedding",
      k = 4, iters = 2, tau = 2.0).isEmpty)
    val assign = Clustering.kmeansLattice(emb, "vec_id", "embedding",
      k = 4, iters = 2)
      .as[(Long, Int, Long)].collect().map { case (id, c, _) => id -> c }
    val byCluster = assign.groupBy(_._2).view.mapValues(_.map(_._1).sorted)
    val all = Clustering.semanticDedup(emb, "vec_id", "embedding",
      k = 4, iters = 2, tau = -2.0)
      .select($"id", $"keep_of", $"n_dups")
      .as[(Long, Long, Long)].collect()
      .map { case (id, k2, n) => id -> ((k2, n)) }.toMap
    // cosine >= -2 always holds: every non-minimum id is dropped, its
    // keeper is the cluster minimum, n_dups = lower-id mates
    val expected = byCluster.values.flatMap { ids =>
      ids.zipWithIndex.drop(1).map { case (id, i) =>
        id -> ((ids.head, i.toLong))
      }
    }.toMap
    assert(all == expected)
  }

  test("setSimJoin equals the naive quadratic exact-Jaccard join") {
    val sets = docs.select($"doc_id",
      array_distinct(Dedup.shingles($"text", 3)).as("s"))
    val naive = sets.as("a").crossJoin(sets.as("b"))
      .filter($"a.doc_id" < $"b.doc_id")
      .withColumn("inter",
        size(array_intersect($"a.s", $"b.s")).cast("long"))
      .withColumn("uni",
        size($"a.s") + size($"b.s") - $"inter")
      .filter($"inter" * 2 >= $"uni")
      .select($"a.doc_id", $"b.doc_id", $"inter", $"uni")
      .as[(Long, Long, Long, Long)].collect().toSet
    val fast = Dedup.setSimJoin(docs, "doc_id", "text",
      n = 3, tauNum = 1, tauDen = 2)
      .select($"id_a", $"id_b", $"inter", $"uni")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(fast == naive)
    assert(fast.nonEmpty, "fixture should contain near-dup pairs")
  }

  test("setSimJoin prefix filter prunes the candidate space") {
    // count candidate pairs the prefix stage emits vs all doc pairs
    val n = docs.count()
    val sets = docs.select($"doc_id".as("id"),
      array_distinct(Dedup.shingles($"text", 3)).as("sh"))
      .withColumn("sz", size($"sh"))
    val oMin = floor(($"sz" * 1 + 1).cast("double") / 2).cast("int")
    val cand = sets
      .select($"id", explode(slice($"sh", lit(1),
        ($"sz" - oMin + 1).cast("int"))).as("s"))
      .groupBy("s").agg(collect_list($"id").as("ids"))
      .select(explode(graft.functions.PairFunctions
        .longBucketPairs($"ids")).as("p"))
      .select($"p.id_a", $"p.id_b").distinct().count()
    assert(cand < n * (n - 1) / 2 / 10,
      s"prefix filter left $cand of ${n * (n - 1) / 2} pairs")
  }

  test("bm25TopK matches a driver-side score computation") {
    val corpus = Seq(
      (1L, "dup dup spark merge a b c d"),
      (2L, "spark merge spark merge x y"),
      (3L, "dup only here"),
      (4L, "no query terms at all in this one"),
      (5L, "merge")).toDF("doc_id", "text")
    val terms = Seq("dup", "merge", "spark")
    val got = TextStats.bm25TopK(corpus, "doc_id", "text", terms, 10)
      .as[(Long, Long)].collect()
    // local replication, same association order, k1=1.25 b=0.75
    val toks = Map(1L -> 8, 2L -> 6, 3L -> 3, 4L -> 8, 5L -> 1)
    val n = 5.0; val tot = 26.0
    val tf = Map(
      (1L, "dup") -> 2, (1L, "spark") -> 1, (1L, "merge") -> 1,
      (2L, "spark") -> 2, (2L, "merge") -> 2,
      (3L, "dup") -> 1, (5L, "merge") -> 1)
    val df = Map("dup" -> 2.0, "merge" -> 3.0, "spark" -> 2.0)
    def s(id: Long, t: String): Double = tf.get((id, t)) match {
      case None => 0.0
      case Some(f) =>
        val idf = (n - df(t) + 0.5) / (df(t) + 0.5)
        idf * (f.toDouble * 2.25) /
          (f.toDouble + 1.25 * (0.25 + 0.75 * (toks(id).toDouble * n / tot)))
    }
    val expected = Seq(1L, 2L, 3L, 5L)
      .map(id => id -> math.floor(
        (s(id, "dup") + s(id, "merge") + s(id, "spark")) * 1e6).toLong)
      .sortBy { case (id, sc) => (-sc, id) }
    assert(got.toSeq == expected)
  }
}
