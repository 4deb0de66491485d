package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding clustering on an integer lattice, and the SemDeDup-style
  * semantic near-dup removal built on top of it (Abbas et al. 2023:
  * cluster the corpus, then prune highly-similar pairs inside each
  * cluster — pairwise work drops from O(n²) to Σ O(|cluster|²)).
  *
  * Determinism-by-design: k-means on floats is not replayable across
  * engines (mean = order-dependent FP sum), so vectors are quantized to
  * an integer lattice first — `floor(x · 2^scaleBits)` (the multiply is
  * by a power of two, hence exact) — and every Lloyd step is then pure
  * int64 arithmetic: squared-L2 sums, floor-division centroid means.
  * Any engine replays assignments bit-for-bit (the q81 oracle does),
  * and the quantization error (≤ 2^-scaleBits per coordinate) is
  * irrelevant for cluster shapes. Production centroid *training* could
  * still happen offline on floats; this module is the engine-side
  * operator suite: quantize, assign, update, dedup.
  *
  * Scale shape: centroids live on the driver (k·dim longs — the same
  * contract as Spark MLlib KMeans and `Similarity.seedCentroids`), each
  * Lloyd iteration is one map (assignment expression, no shuffle) plus
  * one aggregation keyed by (cluster, dim) — k·dim result rows, skew-free
  * because every vector contributes to exactly `dim` keys. Nothing here
  * self-joins or broadcasts the data side.
  */
object Clustering {

  /** `floor(x · 2^scaleBits)` per coordinate — float→double widening and
    * the power-of-two multiply are both exact, so any engine that reads
    * the same parquet floats produces the same lattice points.
    */
  def latticeQuant(v: Column, scaleBits: Int = 10): Column =
    transform(v, x => floor(x.cast("double") * (1L << scaleBits)).cast("long"))

  /** Integer squared-L2 against a literal lattice centroid. Interpreted
    * HOF fold — fine for k·dim ≤ ~10³ per row; the float hot path has
    * the codegen'd VecDot kernel, and this one can get the same
    * treatment if a profile ever shows it hot.
    */
  private def sqDistLat(v: Column, c: Array[Long]): Column =
    aggregate(
      zip_with(v, lit(c), (a, b) => (a - b) * (a - b)),
      lit(0L), (acc, x) => acc + x)

  /** struct<cluster:int, d2:bigint> — argmin cluster over `cents` with
    * its squared distance; ties take the lowest cluster index
    * (array_position returns the first index of the min, and integer
    * distances make "equal" unambiguous). Distances materialize in one
    * array so each is evaluated once (the q65 lesson: a least()/when()
    * argmin chain re-evaluates every distance per branch).
    */
  def nearestLat(v: Column, cents: Seq[Array[Long]]): Column = {
    require(cents.nonEmpty, "nearestLat: need at least one centroid")
    val d = array(cents.map(c => sqDistLat(v, c)): _*)
    struct(
      (array_position(d, array_min(d)) - 1).cast("int").as("cluster"),
      array_min(d).as("d2"))
  }

  /** Deterministic seeds: the lattice points of the `k` smallest ids
    * (the `Similarity.seedCentroids` convention, so oracles can replay
    * the pick with ORDER BY id LIMIT k).
    */
  private def seedLat(q: DataFrame, idCol: String, k: Int): Seq[Array[Long]] =
    q.orderBy(col(idCol).asc).limit(k).select(col("qv"))
      .collect().map(_.getSeq[Long](0).toArray).toSeq

  /** Train centroids: `iters - 1` Lloyd updates from the seeded start
    * (so `iters` total assignment passes including the caller's final
    * one). Update = per-(cluster, dim) int64 sums and counts — one
    * skew-free aggregation per iteration, k·dim rows collected — then
    * FLOOR-division means (explicit `s - pmod(s, n)` numerator, so the
    * floor survives any engine's integer-division convention; the final
    * divide is exact). A cluster that loses all members keeps its
    * previous centroid.
    */
  def fitLatticeCentroids(df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, scaleBits: Int = 10): Seq[Array[Long]] = {
    require(k > 0 && iters >= 1, s"need k > 0, iters >= 1; got $k, $iters")
    val q = df.select(col(idCol), latticeQuant(col(vecCol), scaleBits).as("qv"))
    var cents = seedLat(q, idCol, k)
    for (_ <- 1 until iters) {
      val dim = cents.head.length
      val rows = q
        .withColumn("cluster", nearestLat(col("qv"), cents).getField("cluster"))
        .select(col("cluster"), posexplode(col("qv")).as(Seq("dim", "qd")))
        .groupBy("cluster", "dim")
        .agg(sum("qd").as("s"), count(lit(1)).as("n"))
        .collect()
      val m = rows.map(r => ((r.getInt(0), r.getInt(1)),
        (r.getLong(2), r.getLong(3)))).toMap
      cents = cents.zipWithIndex.map { case (prev, j) =>
        Array.tabulate(dim) { dd =>
          m.get((j, dd)) match {
            case Some((s, n)) => Math.floorDiv(s, n)
            case None         => prev(dd)
          }
        }
      }
    }
    cents
  }

  /** Cluster assignment after `iters` Lloyd passes: (id, cluster, d2).
    * One map over the data with the trained centroids as literals — no
    * join against an assignment table, so the operator composes with
    * any downstream per-cluster work at zero extra shuffles.
    */
  def kmeansLattice(df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, scaleBits: Int = 10): DataFrame = {
    val cents = fitLatticeCentroids(df, idCol, vecCol, k, iters, scaleBits)
    df.select(col(idCol),
        nearestLat(latticeQuant(col(vecCol), scaleBits), cents).as("nc"))
      .select(col(idCol), col("nc.cluster").as("cluster"), col("nc.d2").as("d2"))
  }

  /** SemDeDup: inside each k-means cluster, a vector whose cosine to a
    * LOWER-id cluster-mate reaches `tau` is a semantic duplicate of it.
    * Returns the drop table: (id, keep_of = lowest such partner,
    * n_dups = how many lower-id partners matched, cos6 = max cosine,
    * truncated to micro-units).
    *
    * Plan: map-side cluster tag (centroids are literals) → ONE shuffle
    * keyed by cluster → `collect_list` → the codegen-side
    * `CosineBucketPairs` JVM kernel emits verified pairs per bucket →
    * per-id aggregation. The corpus is never self-joined (a self-join
    * would compute the assignment subplan twice — exchange reuse does
    * not fire across aliased join sides) and never broadcast. Cosines
    * use the same left-to-right double fold as VecDot, so the q82
    * oracle replays the `>= tau` decision on identical bits.
    *
    * At 100 TB: k scales with the corpus (SemDeDup uses ~10⁵ clusters
    * for web-scale data) keeping |cluster| — and the O(|cluster|²) pair
    * loop — bounded; the shuffle volume is one row per vector either way.
    */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, tau: Double, scaleBits: Int = 10): DataFrame = {
    // the pair kernel reads the bucket struct positionally (getLong /
    // float array) — a wrong id or element type would not throw, it
    // would read garbage ids into the drop-table (same guard as
    // setSimJoin's)
    require(df.schema(idCol).dataType ==
      org.apache.spark.sql.types.LongType,
      "semanticDedup: id column must be bigint (pair kernel contract)")
    require(df.schema(vecCol).dataType ==
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType, false) ||
      df.schema(vecCol).dataType ==
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType, true),
      "semanticDedup: vector column must be array<float>")
    val cents = fitLatticeCentroids(df, idCol, vecCol, k, iters, scaleBits)
    df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("nrm", Similarity.l2norm(col("v")))
      .withColumn("cluster",
        nearestLat(latticeQuant(col("v"), scaleBits), cents).getField("cluster"))
      .groupBy("cluster")
      .agg(collect_list(struct(col("id"), col("v"), col("nrm"))).as("ms"))
      .select(explode(graft.functions.PairFunctions
        .cosineBucketPairs(col("ms"), tau)).as("p"))
      .groupBy(col("p.id_b").as("id"))
      .agg(min(col("p.id_a")).as("keep_of"),
        count(lit(1)).as("n_dups"),
        max(floor(col("p.cosine") * 1e6).cast("long")).as("cos6"))
  }
}
