package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._
import graft.ext.{Bloom, Clustering, Dedup, Similarity, Sketches, Skew, TextStats}
import graft.streaming.EventsOps
import graft.queries.ExtHarness._
import graft.queries.ExtOracleShared._

/** embedding similarity: brute/LSH/IVF/PQ ANN, kNN join, reranking, drift — one domain slice of the graded
  * extension-query registry. Pure registry split (r13 verdict item 7):
  * entries are verbatim from the pre-split ExtQueries.scala; shared
  * plumbing lives in [[ExtHarness]] (streaming replay, temp dirs) and
  * [[ExtOracleShared]] (portable oracle SQL fragments). Composed back
  * into the driver contract by [[ExtQueries]].
  */
private[queries] object ExtAnnQueries {

  /** Clustered-embedding fixture for the graded hier (two-level) IVF
    * rows (r13 verdict item 1): the hier quantizer's DESIGN REGIME is
    * clustered vectors, but the shipped embeddings are near-orthogonal
    * — so derive a clustered table from them, deterministically and
    * seed-sensitively, in arithmetic both engines replay bit-exactly.
    * Centers = the `max(8, n/50)` smallest-id embeddings; row i's
    * vector = center(vec_id mod nClus) + 2⁻⁴·embedding(i), computed in
    * double and rounded once to float (2⁻⁴ is dyadic, so the constant
    * and every product/sum are IEEE-identical in Spark and DuckDB; one
    * double→float round-to-nearest at the end is deterministic in
    * both). The centers double as the IVF centroid list — the
    * "offline-trained centroids" a production IVF ships.
    */
  private def clusteredFixture(s: SparkSession, d: String)
      : (DataFrame, Seq[Array[Float]]) = {
    val emb = embeddings(s, d)
    val nClus = math.max(8, (emb.count() / 50L).toInt)
    val centers = Similarity.seedCentroids(emb, "vec_id", "embedding",
      nClus)
    import s.implicits._
    val ctr = centers.zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("cix", "cvec")
    val mixed = emb
      .join(broadcast(ctr),
        pmod(col("vec_id"), lit(nClus.toLong)) === col("cix"))
      .select(col("vec_id").as("id"),
        zip_with(col("cvec"), col("embedding"), (c, e) =>
          (c.cast("double") + lit(0.0625) * e.cast("double"))
            .cast("float")).as("v"))
    (mixed, centers)
  }

  val defs: Map[String, Q] = Map(

    // Two-level (hier) IVF assignment, graded EXACTLY (r13 verdict
    // item 1): every clustered-fixture vector's hier cell — argmin over
    // the members of its two nearest super-centroids (supers = every
    // ceil(√nlist)-th centroid; each centroid attached to its nearest
    // super, ties to the lower super index; all ties to the lower
    // centroid index). The oracle replays the super table, the
    // membership table, and the two-level argmin in SQL, so the row
    // grades the exact cells — not recall-vs-flat. hier is the
    // measured recommendation for clustered corpora (IvfRegimeProbe
    // r13: 1.6× at nlist=400 → 16× at nlist=30 000 vs the flat scan,
    // ≥99.86 % agreement); it stays non-default because the flat rows'
    // oracles replay exact flat cells and the raw shipped embeddings
    // are near-orthogonal.
    "q232_ivf_hier_cells" -> ((s, d) => {
      val (mixed, centers) = clusteredFixture(s, d)
      val kern = graft.functions.IvfFunctions.kernel(centers)
      mixed.select(col("id"),
        graft.functions.IvfFunctions.cellOf(col("v"), kern, hier = true)
          .as("cell"))
        .orderBy("id")
    }),

    // The full hier-path search operator: knnJoin with hier=true —
    // corpus rows keyed by their two-level cell, query rows exploded
    // to their 3 nearest cells from the top-2-super member pool
    // (probesHier, including its walk-further-supers fallback, which
    // the oracle replays in general form). Same join/score/rank
    // pipeline as q84, so this grades exactly the hier substitution.
    "q233_knn_hier" -> ((s, d) => {
      val (mixed, centers) = clusteredFixture(s, d)
      Similarity.knnJoin(mixed, "id", "v", k = 3, centers, nProbe = 3,
        hier = true)
        .orderBy("q_id", "rank")
    }),

    // The hier path's AT-REST twin (q77's analog): the clustered
    // fixture lands in a two-level layout (sup=<j>/cell=<c> partition
    // dirs, cells from cellHier), and the search prunes by super THEN
    // cell — both IN-lists in PartitionFilters (PlanAuditSpec asserts
    // it). Probes come from the kernel's own probesHier on the query
    // vector, so the result — and the oracle — replay exactly the
    // q232/q233 two-level tables.
    "q235_ivf_hier_at_rest" -> ((s, d) => {
      val (mixed, centers) = clusteredFixture(s, d)
      val path = tempDir("graft_q235_") + "/emb"
      Similarity.writeIvfHier(mixed, "id", "v", path, centers)
      Similarity.ivfHierTopKAtRest(s, path, "id", "v", 0L, 10, centers,
        nProbe = 3)
    }),

    // Hier-index APPEND lifecycle (q183's shape for the q235 layout):
    // build the two-level index over the even-id half of the clustered
    // fixture, append the odd-id half WITHOUT touching existing files
    // (cell/super assignment is a pure function of (centroids, vector),
    // so appended rows land in the existing sup=/cell= dirs), then
    // search — the result must equal a full-build search, so the
    // oracle IS q235's full-fixture replay. The query vector is passed
    // EXPLICITLY (one driver-side lookup on the SOURCE fixture, the
    // production contract) — q235 keeps the documented scan-fallback
    // path, so both lookup modes stay graded.
    "q237_ivf_hier_append" -> ((s, d) => {
      val (mixed, centers) = clusteredFixture(s, d)
      val path = tempDir("graft_q237_") + "/emb"
      Similarity.writeIvfHier(mixed.filter(col("id") % 2 === 0), "id",
        "v", path, centers)
      Similarity.appendIvfHier(mixed.filter(col("id") % 2 === 1), "id",
        "v", path, centers)
      val qVec = mixed.filter(col("id") === 0L).select("v")
        .head().getSeq[Float](0).toArray
      Similarity.ivfHierTopKAtRest(s, path, "id", "v", 0L, 10, centers,
        nProbe = 3, queryVec = Some(qVec))
    }),

    // IVF-PQ index AT REST (the at-rest family's last member, and the
    // production shape at 100 TB where raw vectors fit no scan
    // budget): (id, codes) rows land under cell=<c> partition dirs —
    // m small ints per row instead of d floats — the search prunes to
    // the 3 probed cells at PLANNING time (PlanAuditSpec asserts the
    // IN-list in PartitionFilters AND that the scan reads no vector
    // column), and scores by ADC table lookups (PqAdcKernel: per-
    // (block, code) partial dot/norm LUTs built driver-side from the
    // codebooks and the query). The oracle replays the cell prune,
    // the code assignment, and the LUT-grouped fold arithmetic
    // exactly. The query vector comes from the SOURCE table by one
    // driver-side row lookup — the index has no raw vectors to look
    // up, which is the point.
    "q236_ivfpq_at_rest" -> ((s, d) => {
      val emb = embeddings(s, d)
      val cents = Similarity.seedCentroids(emb, "vec_id", "embedding", 16)
      val cbs = Similarity.pqCodebooks(emb, "vec_id", "embedding",
        m = 8, k = 16)
      val path = tempDir("graft_q236_") + "/emb"
      Similarity.writeIvfPq(emb, "vec_id", "embedding", path, cents, cbs)
      val qVec = emb.filter(col("vec_id") === 0L).select("embedding")
        .head().getSeq[Float](0).toArray
      Similarity.ivfPqTopKAtRest(s, path, "vec_id", 0L, qVec, 10, cents,
        cbs, nProbe = 3)
    }),

    // The IVF-PQ search with the production exact-rerank tail: the
    // ADC stage (q236's — codes-only I/O, cell-pruned) picks the
    // 30-candidate pool, then the pool's ids join back to the SOURCE
    // table's raw vectors (a 30-row broadcast join, never a corpus
    // scan) and the answer is exact cosine top-10. ADC ordering
    // decides the POOL; exact cosine decides the ANSWER — so PQ
    // quantization error can demote a candidate out of the pool but
    // never mis-rank the final list.
    "q238_ivfpq_rerank" -> ((s, d) => {
      val emb = embeddings(s, d)
      val cents = Similarity.seedCentroids(emb, "vec_id", "embedding", 16)
      val cbs = Similarity.pqCodebooks(emb, "vec_id", "embedding",
        m = 8, k = 16)
      val path = tempDir("graft_q238_") + "/emb"
      Similarity.writeIvfPq(emb, "vec_id", "embedding", path, cents, cbs)
      val qVec = emb.filter(col("vec_id") === 0L).select("embedding")
        .head().getSeq[Float](0).toArray
      Similarity.ivfPqTopKAtRest(s, path, "vec_id", 0L, qVec, 10, cents,
        cbs, nProbe = 3, rerank = 30, rerankFrom = Some((emb, "embedding")))
    }),

    // The at-rest apex — hier + PQ in one layout: the clustered
    // fixture's codes (8x16 codebooks seeded from its own 16
    // smallest-id vectors) land under sup=<j>/cell=<c> two-level
    // dirs (cells from cellHier), and the search prunes BOTH levels
    // at planning time and ADC-scores the code column — q235's
    // pruning with q236's I/O and scoring, composed. At production
    // nlist this is the only shape whose directory metadata AND row
    // payload both fit scan budgets.
    "q240_ivfpq_hier_at_rest" -> ((s, d) => {
      val (mixed, centers) = clusteredFixture(s, d)
      val cbs = Similarity.pqCodebooks(mixed, "id", "v", m = 8, k = 16)
      val path = tempDir("graft_q240_") + "/emb"
      Similarity.writeIvfPqHier(mixed, "id", "v", path, centers, cbs)
      val qVec = mixed.filter(col("id") === 0L).select("v")
        .head().getSeq[Float](0).toArray
      Similarity.ivfPqHierTopKAtRest(s, path, "id", 0L, qVec, 10,
        centers, cbs, nProbe = 3)
    }),

    // PQ-index APPEND lifecycle (q237's shape for the q236 layout):
    // build the code index over even vec_ids, append the odd shard
    // (same deterministic codebooks/centroids -> same codes, same
    // cell dirs), search — must equal the full build, so the oracle
    // IS q236's.
    "q239_ivfpq_append" -> ((s, d) => {
      val emb = embeddings(s, d)
      val cents = Similarity.seedCentroids(emb, "vec_id", "embedding", 16)
      val cbs = Similarity.pqCodebooks(emb, "vec_id", "embedding",
        m = 8, k = 16)
      val path = tempDir("graft_q239_") + "/emb"
      Similarity.writeIvfPq(emb.filter(col("vec_id") % 2 === 0),
        "vec_id", "embedding", path, cents, cbs)
      Similarity.appendIvfPq(emb.filter(col("vec_id") % 2 === 1),
        "vec_id", "embedding", path, cents, cbs)
      val qVec = emb.filter(col("vec_id") === 0L).select("embedding")
        .head().getSeq[Float](0).toArray
      Similarity.ivfPqTopKAtRest(s, path, "vec_id", 0L, qVec, 10, cents,
        cbs, nProbe = 3)
    }),

    // Exact brute-force cosine top-k against vec_id=0 (the ANN baseline).
    "q28_cosine_topk" -> ((s, d) => {
      Similarity.bruteTopK(embeddings(s, d), "vec_id", "embedding", 0L, 10)
    }),

    // Sign-random-projection bucketing (the ANN scale path's partition key).
    "q29_rp_bucket" -> ((s, d) => {
      embeddings(s, d).select(
        col("vec_id"),
        Similarity.rpBucket(col("embedding"), 8).as("bucket"))
        .orderBy("vec_id")
    }),

    // Multi-probe LSH ANN top-k (bucket hamming <= 2), exact rerank.
    "q30_ann_topk" -> ((s, d) => {
      Similarity.lshTopK(embeddings(s, d), "vec_id", "embedding", 0L, 10,
        nBits = 8, probeHamming = 2)
    }),

    // The ANN scale path, graded end-to-end: build the bucket-partitioned
    // index (writeBucketed), then answer the same top-k via partition
    // pruning — the probe IN-list lands in the scan's PartitionFilters,
    // touching ~14% of the directories instead of scanning everything
    // (the 100 TB difference vs q30's in-memory form). Probe set ==
    // {buckets within hamming 2}, so results — and the oracle — are
    // exactly q30's.
    "q53_ann_at_rest" -> ((s, d) => {
      // Per-invocation unique dir (tempDir: unique per run + swept at
      // JVM exit): a stable shared path would let a concurrent run
      // overwrite the index mid-read.
      val path = tempDir("graft_q53_") + "/emb"
      Similarity.writeBucketed(embeddings(s, d), "embedding", path, nBits = 8)
      Similarity.lshTopKAtRest(s, path, "vec_id", "embedding", 0L, 10,
        nBits = 8, probeHamming = 2)
    }),

    // IVF ANN top-k: inverted-file coarse quantizer — assign every
    // vector to its nearest centroid (argmin squared-L2, ties to the
    // lowest index), probe the 3 cells nearest the query, exact cosine
    // rerank inside them. The data-adaptive complement to q30/q53's
    // data-oblivious sign-LSH; at rest `cell` is a partition key with
    // exactly q53's directory-pruning story. Centroids here are the
    // seeded deterministic pick (16 smallest ids) so the oracle can
    // replay assignment bit-for-bit; production swaps in offline-trained
    // k-means centroids without touching the search path.
    "q65_ivf_ann" -> ((s, d) => {
      val emb = embeddings(s, d)
      val cents = Similarity.seedCentroids(emb, "vec_id", "embedding", 16)
      Similarity.ivfTopK(emb, "vec_id", "embedding", 0L, 10, cents,
        nProbe = 3)
    }),

    // q65's IVF search over an AT-REST index: cells are partition
    // directories (writeIvf), the probe IN-list lands in
    // PartitionFilters, and only ~3/16 of the index is read — q53's
    // directory-pruning story with data-adaptive cells. Same parameters
    // as q65, so the oracle IS q65's.
    "q77_ivf_at_rest" -> ((s, d) => {
      val emb = embeddings(s, d)
      val cents = Similarity.seedCentroids(emb, "vec_id", "embedding", 16)
      val path = tempDir("graft_q77_") + "/emb"
      Similarity.writeIvf(emb, "vec_id", "embedding", path, cents)
      Similarity.ivfTopKAtRest(s, path, "vec_id", "embedding", 0L, 10,
        cents, nProbe = 3)
    }),

    // Batch KNN self-join: 3 nearest neighbors of EVERY vector (the
    // kNN-graph builder) via IVF-cell blocking — corpus rows keyed by
    // their cell, query rows exploded to their 3 nearest cells
    // (plan-side argsort, no driver probes), one equi-join + one
    // window; never a cross product. Oracle replays assignment,
    // probing, scoring, and ranking.
    "q84_knn_join" -> ((s, d) => {
      val emb = embeddings(s, d)
      val cents = Similarity.seedCentroids(emb, "vec_id", "embedding", 16)
      Similarity.knnJoin(emb, "vec_id", "embedding", k = 3, cents,
        nProbe = 3)
        .orderBy("q_id", "rank")
    }),

    // The same kNN self-join graded UNDER ITS SCALING CONTRACT
    // (Similarity.knnJoin scaladoc, r11-measured): the cell count is
    // DERIVED from the corpus — nCells = max(nProbe, n/100), the IVF
    // nlist rule holding target cell size constant — so candidate
    // volume stays ~nProbe·targetCellSize per query at every SF
    // (measured 30× tail exponent 0.79 vs 1.79 for q84's fixed 16
    // cells). q84 stays graded as the small-corpus fixed-cell variant;
    // THIS row is the plan you run at 100×. The oracle derives the
    // same count from the same table in SQL.
    "q84_knn_scaled" -> ((s, d) => {
      val emb = embeddings(s, d)
      val nProbe = 3
      val nCells = math.max(nProbe, (emb.count() / 100L).toInt)
      val cents = Similarity.seedCentroids(emb, "vec_id", "embedding",
        nCells)
      Similarity.knnJoin(emb, "vec_id", "embedding", k = 3, cents,
        nProbe = nProbe)
        .orderBy("q_id", "rank")
    }),

    // Integer-lattice Lloyd k-means (2 assignment passes, 1 centroid
    // update): quantize → argmin squared-L2 → floor-div means → argmin.
    // Pure int64 arithmetic end to end, so the oracle replays cluster
    // ids AND distances bit-for-bit.
    "q81_kmeans" -> ((s, d) =>
      Clustering.kmeansLattice(embeddings(s, d), "vec_id", "embedding",
        k = 8, iters = 2)
        .orderBy("vec_id")),

    // IVF-PQ ANN search (the faiss-standard pairing, end to end):
    // probe the 3 IVF cells nearest the query, score asymmetrically —
    // unquantized query vs each candidate's PQ reconstruction — top-10
    // by approximate cosine. At rest the scan reads (cell, codes) only:
    // 32x less I/O than the float vectors, partition-pruned by cell.
    "q73_ivfpq_ann" -> ((s, d) => {
      val emb = embeddings(s, d)
      val cents = Similarity.seedCentroids(emb, "vec_id", "embedding", 16)
      val cbs = Similarity.pqCodebooks(emb, "vec_id", "embedding",
        m = 8, k = 16)
      Similarity.ivfPqTopK(emb, "vec_id", "embedding", 0L, 10, cents,
        cbs, nProbe = 3)
    }),

    // Product quantization (8 blocks x 16 centroids over 64 dims = 32x
    // embedding compression): per-block argmin codes plus the cosine of
    // the reconstruction against the original — the quantizer AND its
    // fidelity audit in one graded pass. Codebooks are the seeded
    // deterministic pick (block slices of the 16 smallest-id vectors)
    // so DuckDB replays assignment bit-for-bit.
    "q72_pq_codes" -> ((s, d) => {
      val emb = embeddings(s, d)
      val cbs = Similarity.pqCodebooks(emb, "vec_id", "embedding",
        m = 8, k = 16)
      emb.withColumn("codes",
          Similarity.pqEncode(col("embedding"), cbs))
        .select(col("vec_id"),
          concat_ws(",", col("codes").cast("array<string>")).as("codes"),
          Similarity.trunc(Similarity.cosine(col("embedding"),
            Similarity.pqReconstruct(col("codes"), cbs)), 6)
            .as("recon_cos6"))
        .orderBy("vec_id")
    }),

    // Int8 quantization round-trip audit: per vector, the shared scale,
    // a checksum of the codes, and the max reconstruction error — all
    // exact IEEE arithmetic, hash-compared against the DuckDB replay.
    "q50_embedding_quant" -> ((s, d) => {
      val qs = Similarity.quantizeInt8(col("embedding"))
      embeddings(s, d).select(col("vec_id"), qs.as("qs"), col("embedding"))
        .select(
          col("vec_id"),
          col("qs.scale").as("scale"),
          aggregate(col("qs.q"), lit(0L), (a, x) => a + x).as("q_sum"),
          array_max(zip_with(Similarity.dequantInt8(col("qs")),
            col("embedding"),
            (dq, x) => abs(dq.cast("double") - x.cast("double"))))
            .as("max_err"))
        .orderBy("vec_id")
    }),

    // Reciprocal-rank fusion of two retrieval rankings (BM25 keyword
    // top-20 and cosine-ANN top-20 over the aligned embedding table):
    // score = Σ 1/(60+rank), the standard hybrid-search combiner. Both
    // rank windows run on <= 20 rows (post-top-k), so the single-
    // partition row_number is constant work at any corpus size.
    "q153_rrf_fusion" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val bm = TextStats.bm25TopK(documents(s, d), "doc_id", "text",
        Seq("dup", "merge", "spark"), 20)
        .withColumn("r_bm", row_number().over(
          Window.orderBy(col("score6").desc, col("doc_id").asc)))
        .select(col("doc_id"), col("r_bm"))
      val emb = embeddings(s, d)
      val q = emb.filter(col("vec_id") === 0L)
        .select(col("embedding").as("q_vec"),
          Similarity.l2norm(col("embedding")).as("q_nrm"))
      val cos = emb.filter(col("vec_id") =!= 0L)
        .crossJoin(broadcast(q))
        .select(col("vec_id").as("doc_id"),
          floor(Similarity.dot(col("embedding"), col("q_vec")) /
            (Similarity.l2norm(col("embedding")) * col("q_nrm"))
            * lit(1e6)).cast("long").as("cs6"))
        .orderBy(col("cs6").desc, col("doc_id").asc).limit(20)
        .withColumn("r_cos", row_number().over(
          Window.orderBy(col("cs6").desc, col("doc_id").asc)))
        .select(col("doc_id"), col("r_cos"))
      bm.join(cos, Seq("doc_id"), "full_outer")
        .withColumn("rrf9", floor(
          (coalesce(lit(1.0) / (lit(60.0) + col("r_bm").cast("double")),
            lit(0.0)) +
            coalesce(lit(1.0) / (lit(60.0) + col("r_cos").cast("double")),
              lit(0.0))) * lit(1e9)).cast("long"))
        .orderBy(col("rrf9").desc, col("doc_id").asc).limit(10)
        .select(col("doc_id"), col("r_bm"), col("r_cos"), col("rrf9"))
    }),

    // Leave-one-out target encoding of order price by priority class:
    // integer-exact (sum-own) div (n-1), category stats broadcast back,
    // fact side never shuffled.
    "q160_target_encode" -> ((s, d) =>
      graft.ext.Features.targetEncodeLoo(orders(s, d), "o_orderkey",
        "o_orderpriority", round(col("o_totalprice") * 100).cast("long"))
        .orderBy("o_orderkey")),

    // Hashing-trick feature vectorization (no vocabulary table): each
    // column=value pair maps to an md5 bucket in [0,64); pure per-row
    // projection. Graded output serializes the bucket list to a CSV
    // string — array-typed columns crash the driver compare's pandas
    // sort.
    "q161_feature_hash" -> ((s, d) =>
      graft.ext.Features.featureHash(customer(s, d), "c_custkey",
        Seq("c_mktsegment", "c_nationkey"), dim = 64)
        .select(col("c_custkey"),
          array_join(col("features").cast("array<string>"), ",")
            .as("features"))
        .orderBy("c_custkey")),

    // MMR diversified retrieval (Carbonell-Goldstein SIGIR '98): the
    // 30 most query-similar embeddings re-ranked greedily so picks
    // stay mutually dissimilar (λ=1/2) — integer µ-cosine scores keep
    // every argmax engine-exact.
    "q174_mmr_rerank" -> ((s, d) =>
      graft.ext.Similarity.mmrTopK(embeddings(s, d), "vec_id",
        "embedding", queryId = 0L, k = 8, poolSize = 30)
        .orderBy("rank")),

    // Embedding-centroid drift: integer fixed-point centroids per
    // vec_id bucket of 50, cosine between consecutive buckets — the
    // "did the encoder or data shift" gauge, engine-exact.
    "q184_embedding_drift" -> ((s, d) =>
      graft.ext.Similarity.centroidDrift(embeddings(s, d), "embedding",
        expr("vec_id div 50"))
        .orderBy("bucket")),

    // ANN recall audit: recall@10 of the 8-bit/hamming-2 multi-probe
    // search (q30's parameters) vs exact brute force for ten query
    // vectors — the index-parameter measurement, exact integer ppm.
    "q182_ann_recall" -> ((s, d) =>
      graft.ext.Similarity.annRecallAudit(embeddings(s, d), "vec_id",
        "embedding", queryIds = (0L until 10L).toSeq, k = 10)
        .orderBy("qid")),
  )

  /** Shared CTE chain replaying the hier fixture + two-level
    * assignment for q232/q233: `ctr` (the max(8, n/50) seeded
    * centers), `prm` (nc, step = ceil(√nc)), `mix` (the clustered
    * fixture: center(id mod nc) + 2⁻⁴·embedding in double, one
    * float round), `sup` (every step-th center), `memb` (each
    * centroid's nearest super, ties → lower super index), `vsup`
    * (per-vector super ranking by (d², index)), `hcell` (the
    * two-level argmin over the top-2 supers' members, ties → lower
    * centroid index) — each distance in the exact
    * `(v·v − 2·v·c) + c·c` fold shape of [[graft.functions.IvfKernel]].
    */
  private lazy val hierCtes: String =
    s"""ctr AS (
       |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cix,
       |    embedding AS cvec
       |  FROM embeddings
       |  QUALIFY row_number() OVER (ORDER BY vec_id) <=
       |    greatest(8, (SELECT count(*) FROM embeddings) // 50)),
       |prm AS (SELECT count(*) AS nc,
       |    cast(ceil(sqrt(cast(count(*) AS double))) AS bigint) AS step
       |  FROM ctr),
       |mix AS (
       |  SELECT e.vec_id AS id,
       |    list_transform(range(len(e.embedding)), i ->
       |      cast(cast(c.cvec[i+1] AS double)
       |        + 0.0625 * cast(e.embedding[i+1] AS double) AS float)) AS v
       |  FROM embeddings e
       |  JOIN ctr c ON c.cix = e.vec_id % (SELECT nc FROM prm)),
       |sup AS (
       |  SELECT cix // (SELECT step FROM prm) AS sj, cvec AS svec
       |  FROM ctr WHERE cix % (SELECT step FROM prm) = 0),
       |memb AS (
       |  SELECT cix AS cid, cvec, sj FROM (
       |    SELECT t.cix, t.cvec, s.sj,
       |      row_number() OVER (PARTITION BY t.cix
       |        ORDER BY (${d2Sql("t.cvec", "s.svec")}) ASC, s.sj ASC)
       |        AS rn
       |    FROM ctr t CROSS JOIN sup s) WHERE rn = 1),
       |vsup AS (
       |  SELECT m.id, s.sj,
       |    row_number() OVER (PARTITION BY m.id
       |      ORDER BY (${d2Sql("m.v", "s.svec")}) ASC, s.sj ASC) AS srn
       |  FROM mix m CROSS JOIN sup s),
       |hcell AS (
       |  SELECT id, cid AS cell FROM (
       |    SELECT m.id, mb.cid,
       |      row_number() OVER (PARTITION BY m.id
       |        ORDER BY (${d2Sql("m.v", "mb.cvec")}) ASC, mb.cid ASC)
       |        AS rn
       |    FROM mix m
       |    JOIN vsup ON vsup.id = m.id AND vsup.srn <= 2
       |    JOIN memb mb ON mb.sj = vsup.sj) WHERE rn = 1)"""
      .stripMargin

  /** ADC-scoring CTE chain shared by q236/q238 (needs the `c`-seed,
    * probe and PQ CTEs): `lut` — per (block, code) partial dot against
    * the query's block slice and partial squared norm, each a left
    * fold within its block from 0.0 (exactly [[graft.functions
    * .PqAdcKernel]]'s driver-built tables); `adcscore` — per probed
    * candidate, the m partials folded in block order, divided by
    * sqrt(nsum)·‖q‖, floor-truncated at 1e-6.
    */
  private lazy val adcCtes: String =
    s"""lut AS (
       |  SELECT cb.j, cb.c_idx,
       |    list_reduce(list_prepend(0.0, list_transform(range(8), i ->
       |      cast(cb.csub[i+1] AS double)
       |        * cast(q_vec[cb.j*8+i+1] AS double))),
       |      (x, y) -> x + y) AS dpart,
       |    (${dotSql("cb.csub", "cb.csub")}) AS npart
       |  FROM cb, q),
       |adc AS (
       |  SELECT s.vec_id,
       |    list_reduce(list_prepend(0.0, list(l.dpart ORDER BY s.j)),
       |      (x, y) -> x + y) AS dsum,
       |    list_reduce(list_prepend(0.0, list(l.npart ORDER BY s.j)),
       |      (x, y) -> x + y) AS nsum
       |  FROM asn s JOIN lut l ON l.j = s.j AND l.c_idx = s.c_idx
       |  WHERE s.rn = 1 GROUP BY s.vec_id),
       |adcscore AS (
       |  SELECT adc.vec_id,
       |    floor((dsum / (sqrt(nsum) * sqrt(${dotSql("q_vec", "q_vec")})))
       |      * 1000000) / 1000000 AS score
       |  FROM adc JOIN cell ON cell.vec_id = adc.vec_id, q
       |  WHERE cell.cell IN (SELECT c_idx FROM probes)
       |    AND adc.vec_id <> 0)""".stripMargin

  val oracles: Map[String, String] = Map(

    // Exact replay of the two-level assignment (see hierCtes).
    "q232_ivf_hier_cells" ->
      s"""WITH $hierCtes
         |SELECT id, cell FROM hcell ORDER BY id""".stripMargin,

    // q235: the single-query (id 0) restriction of q233's probe
    // pipeline — pool from the top-m supers (m = 2 unless the top-2
    // pool can't fill nProbe=3), the 3 (d², cid)-smallest pool cells,
    // then exact cosine rerank inside the probed hier cells. The
    // at-rest layout changes WHERE the bytes live, not what the
    // search returns.
    "q235_ivf_hier_at_rest" ->
      s"""WITH $hierCtes,
         |scnt AS (SELECT sj, count(*) AS msz FROM memb GROUP BY sj),
         |q0 AS (SELECT v FROM mix WHERE id = 0),
         |vcum0 AS (
         |  SELECT v.sj, v.srn,
         |    sum(sc.msz) OVER (ORDER BY v.srn) AS cum
         |  FROM vsup v JOIN scnt sc ON sc.sj = v.sj WHERE v.id = 0),
         |m0 AS (
         |  SELECT CASE WHEN max(CASE WHEN srn = 2 THEN cum END) >= 3
         |      THEN 2
         |      ELSE min(CASE WHEN cum >= 3 THEN srn END) END AS m
         |  FROM vcum0),
         |pool0 AS (
         |  SELECT mb.cid, mb.cvec
         |  FROM vcum0 v JOIN memb mb ON mb.sj = v.sj, m0
         |  WHERE v.srn <= m0.m),
         |prb0 AS (
         |  SELECT cid FROM (
         |    SELECT p.cid,
         |      row_number() OVER (
         |        ORDER BY (${d2Sql("q0.v", "p.cvec")}) ASC, p.cid ASC)
         |        AS rn
         |    FROM pool0 p, q0) WHERE rn <= 3)
         |SELECT m.id,
         |  floor((${cosineSql("m.v", "q0.v")}) * 1000000) / 1000000
         |    AS score
         |FROM hcell hc JOIN mix m ON m.id = hc.id, q0
         |WHERE hc.cell IN (SELECT cid FROM prb0) AND m.id <> 0
         |ORDER BY score DESC, m.id ASC LIMIT 10""".stripMargin,

    // q237: build-on-half + append-half must equal the full build —
    // the oracle is q235's full-fixture replay verbatim (same query
    // id, k, nProbe; the append lifecycle changes WHICH FILES hold
    // the rows, never which rows exist).
    "q237_ivf_hier_append" ->
      s"""WITH $hierCtes,
         |scnt AS (SELECT sj, count(*) AS msz FROM memb GROUP BY sj),
         |q0 AS (SELECT v FROM mix WHERE id = 0),
         |vcum0 AS (
         |  SELECT v.sj, v.srn,
         |    sum(sc.msz) OVER (ORDER BY v.srn) AS cum
         |  FROM vsup v JOIN scnt sc ON sc.sj = v.sj WHERE v.id = 0),
         |m0 AS (
         |  SELECT CASE WHEN max(CASE WHEN srn = 2 THEN cum END) >= 3
         |      THEN 2
         |      ELSE min(CASE WHEN cum >= 3 THEN srn END) END AS m
         |  FROM vcum0),
         |pool0 AS (
         |  SELECT mb.cid, mb.cvec
         |  FROM vcum0 v JOIN memb mb ON mb.sj = v.sj, m0
         |  WHERE v.srn <= m0.m),
         |prb0 AS (
         |  SELECT cid FROM (
         |    SELECT p.cid,
         |      row_number() OVER (
         |        ORDER BY (${d2Sql("q0.v", "p.cvec")}) ASC, p.cid ASC)
         |        AS rn
         |    FROM pool0 p, q0) WHERE rn <= 3)
         |SELECT m.id,
         |  floor((${cosineSql("m.v", "q0.v")}) * 1000000) / 1000000
         |    AS score
         |FROM hcell hc JOIN mix m ON m.id = hc.id, q0
         |WHERE hc.cell IN (SELECT cid FROM prb0) AND m.id <> 0
         |ORDER BY score DESC, m.id ASC LIMIT 10""".stripMargin,

    // Full hier knnJoin replay: probesHier's pool rule in general form
    // — pool = members of the top-2 supers, extended nearest-first by
    // WHOLE supers only when the top-2 pool can't fill nProbe=3 (the
    // kernel's rare fallback): m = 2 if cum members at srn=2 >= 3,
    // else the minimal srn whose running member count reaches 3. Then
    // the 3 (d², cid)-smallest pool cells per query, cell-equal
    // candidate pairs against the hier cells, cosine (floor-truncated
    // at 1e-6) and rank per query — q84's pipeline with the hier
    // quantizer substituted.
    "q233_knn_hier" ->
      s"""WITH $hierCtes,
         |scnt AS (SELECT sj, count(*) AS msz FROM memb GROUP BY sj),
         |vcum AS (
         |  SELECT v.id, v.sj, v.srn,
         |    sum(sc.msz) OVER (PARTITION BY v.id ORDER BY v.srn) AS cum
         |  FROM vsup v JOIN scnt sc ON sc.sj = v.sj),
         |mneed AS (
         |  SELECT id,
         |    CASE WHEN max(CASE WHEN srn = 2 THEN cum END) >= 3 THEN 2
         |         ELSE min(CASE WHEN cum >= 3 THEN srn END) END AS m
         |  FROM vcum GROUP BY id),
         |pool AS (
         |  SELECT v.id, mb.cid, mb.cvec
         |  FROM vcum v JOIN mneed USING (id)
         |  JOIN memb mb ON mb.sj = v.sj
         |  WHERE v.srn <= mneed.m),
         |prb AS (
         |  SELECT id, cid FROM (
         |    SELECT p.id, p.cid,
         |      row_number() OVER (PARTITION BY p.id
         |        ORDER BY (${d2Sql("m.v", "p.cvec")}) ASC, p.cid ASC)
         |        AS rn
         |    FROM pool p JOIN mix m ON m.id = p.id) WHERE rn <= 3),
         |cand AS (
         |  SELECT pr.id AS q_id, hc.id AS n_id
         |  FROM prb pr JOIN hcell hc ON hc.cell = pr.cid
         |  WHERE hc.id <> pr.id),
         |sc AS (
         |  SELECT c.q_id, c.n_id,
         |    floor((${cosineSql("qm.v", "nm.v")}) * 1000000) / 1000000
         |      AS score
         |  FROM cand c
         |  JOIN mix qm ON qm.id = c.q_id
         |  JOIN mix nm ON nm.id = c.n_id)
         |SELECT q_id, rank, n_id, score FROM (
         |  SELECT q_id, n_id, score,
         |    row_number() OVER (PARTITION BY q_id
         |      ORDER BY score DESC, n_id ASC) AS rank
         |  FROM sc) WHERE rank <= 3
         |ORDER BY q_id, rank""".stripMargin,

    // q240: q235's two-level probe replay (vcum0/m0/pool0/prb0 over
    // the clustered fixture) composed with q236's ADC replay
    // re-seeded on the FIXTURE (codebooks = block slices of the 16
    // smallest-id mix vectors; per-(block, code) LUT folds against
    // the query's block slices; block-ordered partial sums).
    "q240_ivfpq_hier_at_rest" ->
      s"""WITH $hierCtes,
         |scnt AS (SELECT sj, count(*) AS msz FROM memb GROUP BY sj),
         |q0 AS (SELECT v FROM mix WHERE id = 0),
         |vcum0 AS (
         |  SELECT v.sj, v.srn,
         |    sum(sc.msz) OVER (ORDER BY v.srn) AS cum
         |  FROM vsup v JOIN scnt sc ON sc.sj = v.sj WHERE v.id = 0),
         |m0 AS (
         |  SELECT CASE WHEN max(CASE WHEN srn = 2 THEN cum END) >= 3
         |      THEN 2
         |      ELSE min(CASE WHEN cum >= 3 THEN srn END) END AS m
         |  FROM vcum0),
         |pool0 AS (
         |  SELECT mb.cid, mb.cvec
         |  FROM vcum0 v JOIN memb mb ON mb.sj = v.sj, m0
         |  WHERE v.srn <= m0.m),
         |prb0 AS (
         |  SELECT cid FROM (
         |    SELECT p.cid,
         |      row_number() OVER (
         |        ORDER BY (${d2Sql("q0.v", "p.cvec")}) ASC, p.cid ASC)
         |        AS rn
         |    FROM pool0 p, q0) WHERE rn <= 3),
         |c2 AS (
         |  SELECT row_number() OVER (ORDER BY id) - 1 AS c_idx,
         |    v AS c_vec
         |  FROM (SELECT * FROM mix ORDER BY id LIMIT 16)),
         |blocks2 AS (SELECT unnest(range(8)) AS j),
         |cb2 AS (
         |  SELECT j, c_idx, c_vec[j*8+1 : j*8+8] AS csub
         |  FROM c2, blocks2),
         |sv2 AS (
         |  SELECT id, j, v[j*8+1 : j*8+8] AS vsub FROM mix, blocks2),
         |asn2 AS (
         |  SELECT id, j, c_idx, csub,
         |    row_number() OVER (PARTITION BY id, j
         |      ORDER BY (${d2Sql("vsub", "csub")}) ASC, c_idx ASC) AS rn
         |  FROM sv2 JOIN cb2 USING (j)),
         |lut2 AS (
         |  SELECT cb2.j, cb2.c_idx,
         |    list_reduce(list_prepend(0.0, list_transform(range(8), i ->
         |      cast(cb2.csub[i+1] AS double)
         |        * cast(q0.v[cb2.j*8+i+1] AS double))),
         |      (x, y) -> x + y) AS dpart,
         |    (${dotSql("cb2.csub", "cb2.csub")}) AS npart
         |  FROM cb2, q0),
         |adc2 AS (
         |  SELECT s.id,
         |    list_reduce(list_prepend(0.0, list(l.dpart ORDER BY s.j)),
         |      (x, y) -> x + y) AS dsum,
         |    list_reduce(list_prepend(0.0, list(l.npart ORDER BY s.j)),
         |      (x, y) -> x + y) AS nsum
         |  FROM asn2 s JOIN lut2 l ON l.j = s.j AND l.c_idx = s.c_idx
         |  WHERE s.rn = 1 GROUP BY s.id)
         |SELECT a.id,
         |  floor((dsum / (sqrt(nsum) * sqrt(${dotSql("q0.v", "q0.v")})))
         |    * 1000000) / 1000000 AS score
         |FROM adc2 a JOIN hcell hc ON hc.id = a.id, q0
         |WHERE hc.cell IN (SELECT cid FROM prb0) AND a.id <> 0
         |ORDER BY score DESC, a.id ASC LIMIT 10""".stripMargin,

    "q28_cosine_topk" ->
      s"""WITH q AS (SELECT embedding AS q_vec FROM embeddings WHERE vec_id = 0)
         |SELECT vec_id,
         |  floor((${cosineSql("embedding", "q_vec")}) * 1000000) / 1000000
         |    AS score
         |FROM embeddings, q
         |WHERE vec_id <> 0
         |ORDER BY score DESC, vec_id ASC LIMIT 10""".stripMargin,

    "q29_rp_bucket" ->
      s"""SELECT vec_id, cast($bucketSql AS bigint) AS bucket
         |FROM embeddings ORDER BY vec_id""".stripMargin,

    "q30_ann_topk" ->
      s"""WITH b AS (
         |  SELECT vec_id, embedding, cast($bucketSql AS bigint) AS bucket
         |  FROM embeddings),
         |q AS (SELECT embedding AS q_vec, bucket AS q_bucket FROM b
         |      WHERE vec_id = 0)
         |SELECT vec_id,
         |  floor((${cosineSql("embedding", "q_vec")}) * 1000000) / 1000000
         |    AS score
         |FROM b, q
         |WHERE vec_id <> 0 AND bit_count(xor(bucket, q_bucket)) <= 2
         |ORDER BY score DESC, vec_id ASC LIMIT 10""".stripMargin,

    // q53 probes exactly the hamming<=2 bucket set q30 filters to, so
    // the partition-pruned at-rest result must equal q30's.
    "q53_ann_at_rest" ->
      s"""WITH b AS (
         |  SELECT vec_id, embedding, cast($bucketSql AS bigint) AS bucket
         |  FROM embeddings),
         |q AS (SELECT embedding AS q_vec, bucket AS q_bucket FROM b
         |      WHERE vec_id = 0)
         |SELECT vec_id,
         |  floor((${cosineSql("embedding", "q_vec")}) * 1000000) / 1000000
         |    AS score
         |FROM b, q
         |WHERE vec_id <> 0 AND bit_count(xor(bucket, q_bucket)) <= 2
         |ORDER BY score DESC, vec_id ASC LIMIT 10""".stripMargin,

    // Full replay of the IVF pipeline: seeded centroids (16 smallest
    // ids), squared-L2 assignment in the exact `v·v - 2.0·(v·c) + c·c`
    // expression shape (bit-identical to the Spark side's fused-fold
    // kernels), probe = 3 nearest cells to the query, cosine rerank.
    "q65_ivf_ann" ->
      s"""WITH $ivfSeedCte,
         |$ivfProbeCtes
         |SELECT e.vec_id,
         |  floor((${cosineSql("e.embedding", "q_vec")}) * 1000000) / 1000000
         |    AS score
         |FROM embeddings e JOIN cell ON e.vec_id = cell.vec_id, q
         |WHERE cell.cell IN (SELECT c_idx FROM probes) AND e.vec_id <> 0
         |ORDER BY score DESC, e.vec_id ASC LIMIT 10""".stripMargin,

    // Same parameters as q65 ⇒ same result set: the at-rest layout
    // changes WHERE the bytes live, not what the search returns.
    "q77_ivf_at_rest" ->
      s"""WITH $ivfSeedCte,
         |$ivfProbeCtes
         |SELECT e.vec_id,
         |  floor((${cosineSql("e.embedding", "q_vec")}) * 1000000) / 1000000
         |    AS score
         |FROM embeddings e JOIN cell ON e.vec_id = cell.vec_id, q
         |WHERE cell.cell IN (SELECT c_idx FROM probes) AND e.vec_id <> 0
         |ORDER BY score DESC, e.vec_id ASC LIMIT 10""".stripMargin,

    // Full replay of the IVF-blocked kNN graph: per-vector cell (rn=1),
    // per-query probe cells (rn<=3), cell-equal candidate pairs, exact
    // cosine, rank per query. Reuses q65's assignment CTEs.
    "q84_knn_join" ->
      s"""WITH $ivfSeedCte,
         |$ivfProbeCtes,
         |cand AS (
         |  SELECT pa.vec_id AS q_id, ce.vec_id AS n_id
         |  FROM a pa JOIN cell ce ON pa.c_idx = ce.cell
         |  WHERE pa.rn <= 3 AND ce.vec_id <> pa.vec_id),
         |sc AS (
         |  SELECT cand.q_id, cand.n_id,
         |    floor((${cosineSql("eq.embedding", "en.embedding")}) * 1000000)
         |      / 1000000 AS score
         |  FROM cand
         |  JOIN embeddings eq ON eq.vec_id = cand.q_id
         |  JOIN embeddings en ON en.vec_id = cand.n_id),
         |rk AS (
         |  SELECT q_id, n_id, score,
         |    row_number() OVER (PARTITION BY q_id
         |      ORDER BY score DESC, n_id ASC) AS rank
         |  FROM sc)
         |SELECT q_id, rank, n_id, score FROM rk
         |WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin,

    // q84 under the derived-nCells scaling contract: identical
    // assignment/probe/score/rank replay, with the seed CTE computing
    // nCells from the corpus row count.
    "q84_knn_scaled" ->
      s"""WITH $ivfSeedCteScaled,
         |$ivfProbeCtes,
         |cand AS (
         |  SELECT pa.vec_id AS q_id, ce.vec_id AS n_id
         |  FROM a pa JOIN cell ce ON pa.c_idx = ce.cell
         |  WHERE pa.rn <= 3 AND ce.vec_id <> pa.vec_id),
         |sc AS (
         |  SELECT cand.q_id, cand.n_id,
         |    floor((${cosineSql("eq.embedding", "en.embedding")}) * 1000000)
         |      / 1000000 AS score
         |  FROM cand
         |  JOIN embeddings eq ON eq.vec_id = cand.q_id
         |  JOIN embeddings en ON en.vec_id = cand.n_id),
         |rk AS (
         |  SELECT q_id, n_id, score,
         |    row_number() OVER (PARTITION BY q_id
         |      ORDER BY score DESC, n_id ASC) AS rank
         |  FROM sc)
         |SELECT q_id, rank, n_id, score FROM rk
         |WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin,

    // RRF replay: the q80 BM25 scoring as one CTE, the q28 cosine
    // scoring as another, both top-20 ranked with the same tie-breaks,
    // then the fixed-order 1/(60+r) sum floored at 1e-9 grain.
    "q153_rrf_fusion" ->
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS t
         |  FROM documents),
         |ft AS (
         |  SELECT doc_id, t, count(*) AS tf FROM tok
         |  WHERE t IN ('dup', 'merge', 'spark') GROUP BY 1, 2),
         |dfq AS (SELECT t, count(*) AS df FROM ft GROUP BY 1),
         |tot AS (
         |  SELECT count(*) AS n,
         |    sum(len(string_split_regex(trim(text), '\\s+'))) AS tot
         |  FROM documents),
         |dl AS (
         |  SELECT doc_id,
         |    cast(len(string_split_regex(trim(text), '\\s+')) AS double) AS dl
         |  FROM documents),
         |sc AS (
         |  SELECT f.doc_id, f.t,
         |    (((cast(n AS double) - cast(df AS double)) + 0.5)
         |       / (cast(df AS double) + 0.5))
         |    * (cast(tf AS double) * 2.25)
         |    / (cast(tf AS double)
         |       + 1.25 * (0.25 + 0.75 * ((dl * cast(n AS double))
         |                                 / cast(tot AS double)))) AS sc
         |  FROM ft f JOIN dfq USING (t) JOIN dl USING (doc_id), tot),
         |bm AS (
         |  SELECT doc_id,
         |    row_number() OVER (ORDER BY score6 DESC, doc_id) AS r_bm
         |  FROM (
         |    SELECT doc_id,
         |      cast(floor((coalesce(max(CASE WHEN t = 'dup' THEN sc END), 0.0)
         |        + coalesce(max(CASE WHEN t = 'merge' THEN sc END), 0.0)
         |        + coalesce(max(CASE WHEN t = 'spark' THEN sc END), 0.0))
         |        * 1000000.0) AS bigint) AS score6
         |    FROM sc GROUP BY doc_id
         |    ORDER BY score6 DESC, doc_id LIMIT 20)),
         |qv AS (SELECT embedding AS q_vec FROM embeddings WHERE vec_id = 0),
         |cosr AS (
         |  SELECT doc_id,
         |    row_number() OVER (ORDER BY cs6 DESC, doc_id) AS r_cos
         |  FROM (
         |    SELECT vec_id AS doc_id,
         |      cast(floor((${cosineSql("embedding", "q_vec")})
         |        * 1000000.0) AS bigint) AS cs6
         |    FROM embeddings, qv
         |    WHERE vec_id <> 0
         |    ORDER BY cs6 DESC, doc_id LIMIT 20))
         |SELECT coalesce(bm.doc_id, cosr.doc_id) AS doc_id, r_bm, r_cos,
         |  cast(floor((coalesce(1.0 / (60.0 + cast(r_bm AS double)), 0.0)
         |    + coalesce(1.0 / (60.0 + cast(r_cos AS double)), 0.0))
         |    * 1000000000.0) AS bigint) AS rrf9
         |FROM bm FULL JOIN cosr ON bm.doc_id = cosr.doc_id
         |ORDER BY rrf9 DESC, doc_id LIMIT 10""".stripMargin,

    // Category rollup + join-back replay; sums cast to bigint before
    // the subtraction (hugeint hashes differently), `//` on positives.
    "q160_target_encode" ->
      """WITH t AS (
        |  SELECT o_orderkey, o_orderpriority,
        |    cast(round(o_totalprice * 100) AS bigint) AS c
        |  FROM orders),
        |g AS (
        |  SELECT o_orderpriority, cast(sum(c) AS bigint) AS s,
        |    cast(count(*) AS bigint) AS n
        |  FROM t GROUP BY 1)
        |SELECT o_orderkey, o_orderpriority,
        |  CASE WHEN n > 1 THEN (s - c) // (n - 1) END AS loo
        |FROM t JOIN g USING (o_orderpriority)
        |ORDER BY o_orderkey""".stripMargin,

    // Digit-parsed md5 coordinate (q55's family) mod dim, per column;
    // null features filtered before the sort-distinct; list serialized
    // to a CSV string to keep the graded column scalar-typed.
    "q161_feature_hash" -> {
      def md5u32(e: String) = (0 until 8).map(i =>
        s"(strpos('0123456789abcdef', substr(md5($e), ${i + 1}, 1)) - 1)" +
          s" * ${1L << (4 * (7 - i))}")
        .mkString("(", "\n      + ", ")")
      val b1 = md5u32("'c_mktsegment=' || c_mktsegment")
      val b2 = md5u32("'c_nationkey=' || cast(c_nationkey AS varchar)")
      s"""WITH b AS (
         |  SELECT c_custkey,
         |    CASE WHEN c_mktsegment IS NULL THEN NULL
         |         ELSE $b1 % 64 END AS b1,
         |    CASE WHEN c_nationkey IS NULL THEN NULL
         |         ELSE $b2 % 64 END AS b2
         |  FROM customer)
         |SELECT c_custkey,
         |  array_to_string(list_sort(list_distinct(list_filter([b1, b2],
         |    x -> x IS NOT NULL))), ',') AS features
         |FROM b ORDER BY c_custkey""".stripMargin
    },

    // Greedy MMR, k steps unrolled.
    "q174_mmr_rerank" -> mmrOracleSql(k = 8, pool = 30, lamNum = 1,
      lamDen = 2),

    // Fixed-point centroid replay: parallel unnest zips (v, dim),
    // exact long sums, ordered list agg, lag window, long-fold dots,
    // one IEEE sqrt+divide at the end.
    "q184_embedding_drift" ->
      """WITH e AS (
        |  SELECT vec_id // 50 AS bucket,
        |    unnest(embedding) AS v,
        |    unnest(range(1, len(embedding) + 1)) AS dim
        |  FROM embeddings),
        |s AS (
        |  SELECT bucket, dim, cast(count(*) AS bigint) AS n,
        |    cast(sum(cast(floor(cast(v AS double) * 1048576.0)
        |      AS bigint)) AS bigint) AS sm
        |  FROM e GROUP BY bucket, dim),
        |c AS (
        |  SELECT bucket, cast(max(n) AS bigint) AS n,
        |    list(sm // n ORDER BY dim) AS c
        |  FROM s GROUP BY bucket),
        |p AS (
        |  SELECT bucket, n, c, lag(c) OVER (ORDER BY bucket) AS pv
        |  FROM c),
        |d AS (
        |  SELECT bucket, n, pv,
        |    list_reduce(list_prepend(cast(0 AS bigint),
        |      list_transform(range(len(c)), i -> c[i+1] * pv[i+1])),
        |      (a, x) -> a + x) AS ab,
        |    list_reduce(list_prepend(cast(0 AS bigint),
        |      list_transform(range(len(c)), i -> c[i+1] * c[i+1])),
        |      (a, x) -> a + x) AS aa,
        |    list_reduce(list_prepend(cast(0 AS bigint),
        |      list_transform(range(len(c)), i -> pv[i+1] * pv[i+1])),
        |      (a, x) -> a + x) AS bb
        |  FROM p)
        |SELECT bucket, n,
        |  CASE WHEN pv IS NULL OR aa <= 0 OR bb <= 0 THEN NULL
        |    ELSE cast(floor(cast(ab AS double) /
        |      (sqrt(cast(aa AS double)) * sqrt(cast(bb AS double)))
        |      * 1000000.0) AS bigint) END AS cos6
        |FROM d ORDER BY bucket""".stripMargin,

    // Both arms replayed off one scored CTE: q28's exact window and
    // q30's bucket filter, intersect per query, integer ppm.
    "q182_ann_recall" ->
      s"""WITH b AS (
         |  SELECT vec_id, embedding, cast($bucketSql AS bigint)
         |    AS bucket
         |  FROM embeddings),
         |q AS (SELECT vec_id AS qid, embedding AS qv,
         |        bucket AS qb FROM b WHERE vec_id < 10),
         |s AS (
         |  SELECT q.qid, c.vec_id AS cid, q.qb, c.bucket AS cb,
         |    floor((${cosineSql("c.embedding", "qv")}) * 1000000)
         |      / 1000000 AS score
         |  FROM b c CROSS JOIN q WHERE c.vec_id <> q.qid),
         |br AS (
         |  SELECT qid, cid FROM (
         |    SELECT qid, cid, row_number() OVER (PARTITION BY qid
         |      ORDER BY score DESC, cid) AS rn FROM s)
         |  WHERE rn <= 10),
         |an AS (
         |  SELECT qid, cid FROM (
         |    SELECT qid, cid, row_number() OVER (PARTITION BY qid
         |      ORDER BY score DESC, cid) AS rn
         |    FROM s WHERE bit_count(xor(cb, qb)) <= 2)
         |  WHERE rn <= 10),
         |h AS (
         |  SELECT qid, cast(count(*) AS bigint) AS hits
         |  FROM br JOIN an USING (qid, cid) GROUP BY qid)
         |SELECT q.qid, coalesce(hits, 0) AS hits,
         |  cast(coalesce(hits, 0) * 1000000 // 10 AS bigint)
         |    AS recall_ppm
         |FROM q LEFT JOIN h USING (qid) ORDER BY qid""".stripMargin,

    // Int64 Lloyd replay: assignments AND distances are exact.
    "q81_kmeans" ->
      s"""WITH $kmeansCtes
         |SELECT vec_id, cluster, d2 FROM ka2 ORDER BY vec_id""".stripMargin,

    "q50_embedding_quant" ->
      """WITH t AS (
        |  SELECT vec_id, embedding,
        |    list_max(list_transform(embedding, x -> abs(cast(x AS double))))
        |      AS mx
        |  FROM embeddings),
        |s AS (SELECT vec_id, embedding,
        |    CASE WHEN mx > 0 THEN mx / 127.0 ELSE 1.0 END AS scale FROM t),
        |q AS (SELECT vec_id, embedding, scale,
        |    list_transform(embedding, x ->
        |      cast(floor(cast(x AS double) / scale + 0.5) AS bigint)) AS qv
        |  FROM s)
        |SELECT vec_id, scale,
        |  list_reduce(list_prepend(cast(0 AS bigint), qv), (a, b) -> a + b)
        |    AS q_sum,
        |  list_max(list_transform(range(len(qv)), i ->
        |    abs(cast(cast(qv[i+1] * scale AS float) AS double)
        |        - cast(embedding[i+1] AS double)))) AS max_err
        |FROM q ORDER BY vec_id""".stripMargin,

    // IVF-PQ replay = the shared cell/probe CTEs + the shared PQ
    // code/reconstruction CTEs + asymmetric scoring (unquantized q_vec
    // vs reconstruction).
    "q73_ivfpq_ann" ->
      s"""WITH $ivfSeedCte,
         |$ivfProbeCtes,
         |$pqCtes
         |SELECT e.vec_id,
         |  floor((${cosineSql("enc.recon", "q_vec")}) * 1000000) / 1000000
         |    AS score
         |FROM embeddings e
         |JOIN cell ON e.vec_id = cell.vec_id
         |JOIN enc ON e.vec_id = enc.vec_id, q
         |WHERE cell.cell IN (SELECT c_idx FROM probes) AND e.vec_id <> 0
         |ORDER BY score DESC, e.vec_id ASC LIMIT 10""".stripMargin,

    // IVF-PQ at rest: the shared cell/probe/PQ CTEs plus the ADC
    // LUT replay — per (block, code) partial dot (vs the query's
    // block slice) and partial squared norm, each a left fold within
    // its block from 0.0; the row score folds the m partials in block
    // order and divides by sqrt(nsum)·‖q‖ — exactly PqAdcKernel's
    // grouping (NOT q73's flat reconstruct-then-dot fold; same real
    // value, different float grouping, so this row replays its own).
    "q236_ivfpq_at_rest" ->
      s"""WITH $ivfSeedCte,
         |$ivfProbeCtes,
         |$pqCtes,
         |$adcCtes
         |SELECT sc.vec_id, sc.score
         |FROM adcscore sc
         |ORDER BY score DESC, sc.vec_id ASC LIMIT 10""".stripMargin,

    // q239: append == rebuild for the PQ layout — q236's replay
    // verbatim (the lifecycle changes which files hold the codes,
    // never which codes exist).
    "q239_ivfpq_append" ->
      s"""WITH $ivfSeedCte,
         |$ivfProbeCtes,
         |$pqCtes,
         |$adcCtes
         |SELECT sc.vec_id, sc.score
         |FROM adcscore sc
         |ORDER BY score DESC, sc.vec_id ASC LIMIT 10""".stripMargin,

    // q238: q236's ADC stage selects the 30-candidate pool (same
    // truncated-score + id order), then the answer is EXACT cosine
    // over the pool's raw source vectors — the standard production
    // search tail (ADC decides the pool, exact decides the answer).
    "q238_ivfpq_rerank" ->
      s"""WITH $ivfSeedCte,
         |$ivfProbeCtes,
         |$pqCtes,
         |$adcCtes,
         |pool AS (
         |  SELECT sc.vec_id FROM adcscore sc
         |  ORDER BY sc.score DESC, sc.vec_id ASC LIMIT 30)
         |SELECT e.vec_id,
         |  floor((${cosineSql("e.embedding", "q_vec")}) * 1000000)
         |    / 1000000 AS score
         |FROM embeddings e JOIN pool ON pool.vec_id = e.vec_id, q
         |ORDER BY score DESC, e.vec_id ASC LIMIT 10""".stripMargin,

    // PQ replay: codebooks = block slices of the 16 smallest-id
    // vectors (the shared `c`/PQ CTEs); per (vector, block) assignment
    // by the same v.v - 2.0*(v.c) + c.c fold; reconstruction =
    // flattened chosen entries; fidelity = truncated cosine.
    "q72_pq_codes" ->
      s"""WITH $ivfSeedCte,
         |$pqCtes
         |SELECT e.vec_id, enc.codes,
         |  floor((${cosineSql("e.embedding", "enc.recon")}) * 1000000)
         |    / 1000000 AS recon_cos6
         |FROM embeddings e JOIN enc ON e.vec_id = enc.vec_id
         |ORDER BY e.vec_id""".stripMargin,
  )
}
