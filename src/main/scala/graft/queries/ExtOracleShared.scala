package graft.queries

import graft.ext.{Dedup, Similarity}

/** Portable DuckDB oracle-SQL fragments shared across registry slices
  * (md5-based hash families, IVF/PQ seed CTEs, fuzzy-dedup CTE chains).
  * Moved verbatim from the pre-split ExtQueries.scala (r13 verdict
  * item 7).
  */
private[queries] object ExtOracleShared {

  private[queries] val dotSql = (v: String, q: String) =>
    s"""list_reduce(list_prepend(0.0, list_transform(range(len($v)),
       |  i -> cast($v[i+1] AS double) * cast($q[i+1] AS double))),
       |  (a, b) -> a + b)""".stripMargin

  private[queries] val cosineSql = (v: String, q: String) =>
    s"(${dotSql(v, q)}) / (sqrt(${dotSql(v, v)}) * sqrt(${dotSql(q, q)}))"

  /** q174's greedy MMR unrolled to `k` step CTEs (the fixed-round
    * unroll discipline of the kcore/BFS/LPA oracles): each step picks
    * the integer-µ-cosine argmax of lamNum·rel − (lamDen−lamNum)·
    * max-sim-to-picked, ties by id.
    */
  private[queries] def mmrOracleSql(k: Int, pool: Int, lamNum: Int,
      lamDen: Int): String = {
    val lamC = lamDen - lamNum
    val steps = (2 to k).map { i =>
      val selUnion = (1 until i).map(j => s"SELECT cid FROM pick$j")
        .mkString(" UNION ALL ")
      s"""sel${i - 1} AS MATERIALIZED ($selUnion),
         |s$i AS MATERIALIZED (
         |  SELECT c.cid, $lamNum * c.rel_u - $lamC * m.mx AS sc
         |  FROM cand c
         |  JOIN (SELECT a AS cid, max(sim_u) AS mx FROM p
         |        WHERE b IN (SELECT cid FROM sel${i - 1}) GROUP BY a) m
         |    ON m.cid = c.cid
         |  WHERE c.cid NOT IN (SELECT cid FROM sel${i - 1})
         |  ORDER BY sc DESC, c.cid LIMIT 1),
         |pick$i AS MATERIALIZED (SELECT cid, $i AS rank, sc FROM s$i)""".stripMargin
    }.mkString(",\n")
    val unionAll = (1 to k).map(i => s"SELECT * FROM pick$i")
      .mkString(" UNION ALL ")
    s"""WITH q AS (SELECT embedding AS q_vec FROM embeddings WHERE vec_id = 0),
       |cand AS MATERIALIZED (
       |  SELECT vec_id AS cid, embedding AS cvec,
       |    cast(floor((${cosineSql("embedding", "q_vec")}) * 1000000)
       |      AS bigint) AS rel_u
       |  FROM embeddings, q WHERE vec_id <> 0
       |  ORDER BY rel_u DESC, vec_id LIMIT $pool),
       |p AS MATERIALIZED (
       |  SELECT ca.cid AS a, cb.cid AS b,
       |    cast(floor((${cosineSql("ca.cvec", "cb.cvec")}) * 1000000)
       |      AS bigint) AS sim_u
       |  FROM cand ca JOIN cand cb ON ca.cid <> cb.cid),
       |s1 AS (SELECT cid, $lamNum * rel_u AS sc FROM cand
       |       ORDER BY sc DESC, cid LIMIT 1),
       |pick1 AS MATERIALIZED (SELECT cid, 1 AS rank, sc FROM s1),
       |$steps
       |SELECT cast(rank AS bigint) AS rank, cid AS vec_id,
       |  cast(sc AS bigint) AS mmr_u
       |FROM ($unionAll) ORDER BY rank""".stripMargin
  }

  /** DLT priority sample replay — shared by q164 (direct) and q179
    * (at-rest sharded): top-(n+1) is mergeable, so both grade against
    * one replay.
    */
  private[queries] val prioritySampleReplaySql: String = {
    val h = md5u32Sql("cast(o_orderkey AS varchar)")
    s"""WITH t AS (
       |  SELECT o_orderkey,
       |    cast(round(o_totalprice * 100) AS bigint) AS weight,
       |    cast($h AS bigint) AS h
       |  FROM orders),
       |p AS (
       |  SELECT o_orderkey, weight,
       |    (weight * 4294967296) // (h + 1) AS priority
       |  FROM t),
       |top AS (
       |  SELECT * FROM p ORDER BY priority DESC, o_orderkey LIMIT 301),
       |x AS (
       |  SELECT o_orderkey, weight, priority,
       |    row_number() OVER (ORDER BY priority DESC, o_orderkey) AS rn,
       |    count(*) OVER () AS c, min(priority) OVER () AS mn
       |  FROM top)
       |SELECT o_orderkey, weight, cast(priority AS bigint) AS priority,
       |  cast(greatest(weight,
       |    CASE WHEN c = 301 THEN mn ELSE 0 END) AS bigint)
       |    AS est_weight
       |FROM x WHERE rn <= 300 ORDER BY o_orderkey""".stripMargin
  }

  /** md5 min-k sample + rational rank reads — replays
    * `Sketches.sampleQuantiles` exactly. Shared by q97 (direct) and
    * q176 (at-rest sharded): the shard merge is provably the same
    * sample, so both grade against one replay.
    */
  private[queries] val sampleQuantilesReplaySql: String = {
    val h32 = (0 until 8).map(i =>
      s"(strpos('0123456789abcdef', substr(hh, ${i + 1}, 1)) - 1) * ${math.pow(16, 7 - i).toLong}")
      .mkString("(", " + ", ")")
    s"""WITH h AS (
       |  SELECT lang, n_chars, md5(cast(doc_id AS varchar)) AS hh
       |  FROM documents),
       |hv AS (SELECT lang, n_chars, cast($h32 AS bigint) AS h FROM h),
       |r AS (SELECT lang, n_chars,
       |    row_number() OVER (PARTITION BY lang ORDER BY h, n_chars)
       |      AS rn,
       |    count(*) OVER (PARTITION BY lang) AS n
       |  FROM hv),
       |s AS (SELECT lang, n_chars, n FROM r WHERE rn <= 256),
       |v AS (SELECT lang, n_chars, n,
       |    row_number() OVER (PARTITION BY lang ORDER BY n_chars) AS vr,
       |    count(*) OVER (PARTITION BY lang) AS m
       |  FROM s)
       |SELECT lang, max(n) AS n, max(m) AS m,
       |  max(CASE WHEN vr = (1 * m + 3) // 4 THEN n_chars END) AS p25,
       |  max(CASE WHEN vr = (1 * m + 1) // 2 THEN n_chars END) AS p50,
       |  max(CASE WHEN vr = (3 * m + 3) // 4 THEN n_chars END) AS p75
       |FROM v GROUP BY lang ORDER BY lang""".stripMargin
  }

  /** Squared-L2 in the exact left-associated shape the Spark side
    * computes (`Similarity.sqDist` / the driver twin) — shared by the
    * IVF/PQ oracles so assignment replays bit-for-bit.
    */
  private[queries] val d2Sql = (v: String, c: String) =>
    s"(${dotSql(v, v)}) - 2.0 * (${dotSql(v, c)}) + (${dotSql(c, c)})"

  /** `c`: the 16 seeded centroids (smallest-id embeddings) with their
    * index — the single source for IVF cells (q65/q73) and PQ codebook
    * blocks (q72/q73).
    */
  private[queries] lazy val ivfSeedCte: String =
    """c AS (
      |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c_idx,
      |    embedding AS c_vec
      |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 16))"""
      .stripMargin

  /** `c` with the cell count DERIVED from the corpus — the scaled twin
    * of [[ivfSeedCte]] for q84_knn_scaled: nCells = greatest(3,
    * n div 100), the same rule the Spark side computes, so the oracle
    * follows the scaling contract rather than replaying a constant.
    */
  private[queries] lazy val ivfSeedCteScaled: String =
    """c AS (
      |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c_idx,
      |    embedding AS c_vec
      |  FROM embeddings
      |  QUALIFY row_number() OVER (ORDER BY vec_id) <=
      |    greatest(3, (SELECT count(*) FROM embeddings) // 100))"""
      .stripMargin

  /** Full-vector IVF assignment + query probes (a, cell, q, probes) —
    * needs `c`; shared by q65 and q73.
    */
  private[queries] lazy val ivfProbeCtes: String =
    s"""a AS (
       |  SELECT e.vec_id, c.c_idx,
       |    row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY (${d2Sql("e.embedding", "c.c_vec")}) ASC,
       |        c.c_idx ASC) AS rn
       |  FROM embeddings e CROSS JOIN c),
       |cell AS (SELECT vec_id, c_idx AS cell FROM a WHERE rn = 1),
       |q AS (SELECT embedding AS q_vec FROM embeddings WHERE vec_id = 0),
       |probes AS (
       |  SELECT c_idx FROM c, q
       |  ORDER BY (${d2Sql("q_vec", "c_vec")}) ASC, c_idx ASC LIMIT 3)"""
      .stripMargin

  /** PQ encode/reconstruct over 8 blocks x the 16 seeds (blocks, cb,
    * sv, asn, enc with codes + reconstruction) — needs `c`; shared by
    * q72 and q73.
    */
  private[queries] lazy val pqCtes: String =
    s"""blocks AS (SELECT unnest(range(8)) AS j),
       |cb AS (
       |  SELECT j, c_idx, c_vec[j*8+1 : j*8+8] AS csub
       |  FROM c, blocks),
       |sv AS (
       |  SELECT vec_id, j, embedding[j*8+1 : j*8+8] AS vsub
       |  FROM embeddings, blocks),
       |asn AS (
       |  SELECT vec_id, j, c_idx, csub,
       |    row_number() OVER (PARTITION BY vec_id, j
       |      ORDER BY (${d2Sql("vsub", "csub")}) ASC, c_idx ASC) AS rn
       |  FROM sv JOIN cb USING (j)),
       |enc AS (
       |  SELECT vec_id,
       |    array_to_string(list(c_idx ORDER BY j), ',') AS codes,
       |    flatten(list(csub ORDER BY j)) AS recon
       |  FROM asn WHERE rn = 1 GROUP BY vec_id)""".stripMargin

  /** DuckDB replay of `Dedup.shingles` for word n-grams over the token
    * list `w` (same short-text fallback).
    */
  private[queries] def shinglesSqlN(n: Int): String = {
    val gram = (1 to n).map(i => s"w[i+$i]").mkString(" || ' ' || ")
    s"""CASE WHEN len(w) >= $n THEN
       |  list_transform(range(len(w) - ${n - 1}), i -> $gram)
       |ELSE [array_to_string(w, ' ')] END""".stripMargin
  }

  private[queries] val shinglesSql = shinglesSqlN(3)

  /** DuckDB replay of `Clustering.kmeansLattice` (k=8, iters=2,
    * scaleBits=10): lattice quantization, seeded centroids, one
    * floor-div-mean Lloyd update, final argmin — all int64, terminal
    * CTE `ka2(vec_id, cluster, d2)`. Shared by the q81 and q82 oracles.
    * The explicit `(s - ((s%n)+n)%n) / n` numerator keeps the floor
    * division engine-agnostic (mirrors Spark-side `Math.floorDiv`).
    */
  private[queries] lazy val kmeansCtes: String =
    """kq AS (
      |  SELECT vec_id,
      |    list_transform(embedding,
      |      x -> cast(floor(cast(x AS double) * 1024.0) AS bigint)) AS qv
      |  FROM embeddings),
      |kseeds AS (
      |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, qv AS cv
      |  FROM (SELECT * FROM kq ORDER BY vec_id LIMIT 8)),
      |kdims AS (
      |  SELECT unnest(generate_series(0,
      |    (SELECT max(len(qv)) FROM kq) - 1)) AS dim),
      |ksx AS (SELECT cid, dim, cv[dim + 1] AS cd FROM kseeds, kdims),
      |kd1 AS (
      |  SELECT q.vec_id, s.cid,
      |    cast(sum((q.qv[s.dim + 1] - s.cd) * (q.qv[s.dim + 1] - s.cd))
      |      AS bigint) AS d2
      |  FROM kq q, ksx s GROUP BY 1, 2),
      |ka1 AS (
      |  SELECT vec_id, cid AS cluster FROM (
      |    SELECT vec_id, cid,
      |      row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
      |    FROM kd1) WHERE rn = 1),
      |kcs AS (
      |  SELECT a.cluster AS cid, k.dim,
      |    cast(sum(q.qv[k.dim + 1]) AS bigint) AS s, count(*) AS n
      |  FROM ka1 a JOIN kq q USING (vec_id), kdims k
      |  GROUP BY 1, 2),
      |kc1 AS (
      |  SELECT ksx.cid, ksx.dim,
      |    CASE WHEN kcs.n IS NULL THEN ksx.cd
      |         ELSE cast((kcs.s - ((kcs.s % kcs.n) + kcs.n) % kcs.n)
      |                / kcs.n AS bigint)
      |    END AS cd
      |  FROM ksx LEFT JOIN kcs ON ksx.cid = kcs.cid AND ksx.dim = kcs.dim),
      |kd2 AS (
      |  SELECT q.vec_id, c.cid,
      |    cast(sum((q.qv[c.dim + 1] - c.cd) * (q.qv[c.dim + 1] - c.cd))
      |      AS bigint) AS d2
      |  FROM kq q, kc1 c GROUP BY 1, 2),
      |ka2 AS (
      |  SELECT vec_id, cid AS cluster, d2 FROM (
      |    SELECT vec_id, cid, d2,
      |      row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
      |    FROM kd2) WHERE rn = 1)""".stripMargin

  /** CTE chain replaying the portable fuzzy-dedup pipeline end-to-end
    * (q36 semantics: shingle → sliced-md5 minhash → literal band keys →
    * Jaccard >= 0.5); terminal CTE `pairs(id_a, id_b, jaccard)`. Shared
    * by the q36 and q49 oracles.
    */
  /** Shared shingle→minhash→band CTEs (t, sh, sig, banded, dsh) for
    * every fuzzy-dedup oracle; callers append their own cand/pairs.
    */
  /** q69's replay — shared with q183 (append == rebuild, so the
    * at-rest append grades against the same probe).
    */
  private[queries] def incrementalDedupReplaySql: String =
    s"""WITH $fuzzyBaseCtes,
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS batch_id, b.doc_id AS corpus_id
       |  FROM banded a JOIN banded b ON a.bkey = b.bkey
       |  WHERE a.doc_id < 50 AND b.doc_id >= 50),
       |pairs AS (SELECT * FROM (
       |  SELECT c.batch_id, c.corpus_id,
       |    cast(len(list_intersect(a.s, b.s)) AS double)
       |      / cast(len(list_distinct(list_concat(a.s, b.s))) AS double)
       |      AS jaccard
       |  FROM cand c
       |  JOIN dsh a ON a.doc_id = c.batch_id
       |  JOIN dsh b ON b.doc_id = c.corpus_id)
       |  WHERE jaccard >= 0.5)
       |SELECT batch_id, corpus_id, jaccard FROM pairs
       |ORDER BY batch_id, corpus_id""".stripMargin

  /** q122's replay — shared with q230 (the streaming fold's final
    * per-user state is the same ordered integer recurrence).
    */
  private[queries] lazy val ewmaReplaySql: String =
    """WITH e AS (SELECT user_id, event_id,
        |    cast(ts AS timestamp) AS ts,
        |    cast(round(value * 100) AS bigint) * 1000000 AS x
        |  FROM events),
        |l AS (SELECT user_id, count(*) AS n,
        |    list(x ORDER BY ts, event_id) AS xs
        |  FROM e GROUP BY user_id)
        |SELECT user_id, n,
        |  CASE WHEN len(xs) = 1 THEN xs[1]
        |    ELSE list_reduce(xs, (acc, v) -> (1 * v + 4 * acc) // 5)
        |  END AS ewma6
        |FROM l ORDER BY user_id""".stripMargin

  /** q112's replay — shared with q231 (the streaming trailing-ring's
    * accumulated flags are the same windowed z-test).
    */
  private[queries] lazy val anomalyReplaySql: String =
    """WITH e AS (
        |  SELECT event_id, cast(ts AS timestamp) AS ts, event_type,
        |    cast(round(value * 100) AS bigint) AS x
        |  FROM events),
        |r AS (
        |  SELECT event_id, event_type, x,
        |    count(*) OVER w AS cnt,
        |    sum(x) OVER w AS s1,
        |    sum(x * x) OVER w AS s2
        |  FROM e WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
        |    ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING))
        |SELECT event_id, event_type, x AS x_cents,
        |  cast((20 * x - s1) * (20 * x - s1) AS bigint) AS dev2,
        |  cast(9 * (20 * s2 - s1 * s1) AS bigint) AS bound2
        |FROM r
        |WHERE cnt = 20
        |  AND (20 * x - s1) * (20 * x - s1) > 9 * (20 * s2 - s1 * s1)
        |ORDER BY event_id""".stripMargin

  /** q227's replay: the refreshing stream's visibility boundary — the
    * first arrival bucket (docs < 25) probes only the initial index
    * (>= 50 minus the 200-299 window), the second (25-49) also sees
    * the 200-299 docs appended after bucket 0. Everything else is
    * q69's pipeline verbatim.
    */
  private[queries] def refreshingDedupReplaySql: String =
    s"""WITH $fuzzyBaseCtes,
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS batch_id, b.doc_id AS corpus_id
       |  FROM banded a JOIN banded b ON a.bkey = b.bkey
       |  WHERE (a.doc_id < 25 AND b.doc_id >= 50
       |          AND b.doc_id NOT BETWEEN 200 AND 299)
       |     OR (a.doc_id >= 25 AND a.doc_id < 50 AND b.doc_id >= 50)),
       |pairs AS (SELECT * FROM (
       |  SELECT c.batch_id, c.corpus_id,
       |    cast(len(list_intersect(a.s, b.s)) AS double)
       |      / cast(len(list_distinct(list_concat(a.s, b.s))) AS double)
       |      AS jaccard
       |  FROM cand c
       |  JOIN dsh a ON a.doc_id = c.batch_id
       |  JOIN dsh b ON b.doc_id = c.corpus_id)
       |  WHERE jaccard >= 0.5)
       |SELECT batch_id, corpus_id, jaccard FROM pairs
       |ORDER BY batch_id, corpus_id""".stripMargin

  private[queries] lazy val fuzzyBaseCtes: String = {
    val mh = (0 until 8).map(i =>
      s"list_min(list_transform(shingles, s -> " +
        s"${Dedup.portableSliceSql("s", i)})) AS mh$i").mkString(",\n  ")
    val bandRows = (0 until 4).map(b =>
      s"SELECT doc_id, '$b|' || mh${2 * b} || '|' || mh${2 * b + 1} AS bkey FROM sig")
      .mkString("\n  UNION ALL\n  ")
    s"""t AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
       |  FROM documents),
       |sh AS (SELECT doc_id, ($shinglesSql) AS shingles FROM t),
       |sig AS (SELECT doc_id,
       |  $mh
       |  FROM sh),
       |banded AS (
       |  $bandRows),
       |dsh AS (SELECT doc_id, list_distinct(shingles) AS s FROM sh)""".stripMargin
  }

  /** First 8 md5 hex digits of `e` as an unsigned 32-bit bigint —
    * DuckDB replay of Spark's `conv(substring(md5(e),1,8),16,10)`
    * (the portable hash coordinate family).
    */
  private[queries] def md5u32Sql(e: String): String = (0 until 8).map(i =>
    s"(strpos('0123456789abcdef', substr(md5($e), ${i + 1}, 1)) - 1)" +
      s" * ${1L << (4 * (7 - i))}")
    .mkString("(", "\n      + ", ")")

  /** Count-min probe replay shared by q165 (direct sketch) and q167
    * (at-rest write+append+sum-on-read lifecycle): both must equal the
    * full-corpus matrix probed for the three terms, with exact counts
    * alongside.
    */
  private[queries] lazy val cmProbeOracle: String = {
    val cell = md5u32Sql("cast(r AS varchar) || '|' || t")
    val probe = md5u32Sql("cast(r AS varchar) || '|' || term")
    s"""WITH tk AS (
       |  SELECT t FROM (
       |    SELECT unnest(string_split_regex(trim(text), '\\s+')) AS t
       |    FROM documents)
       |  WHERE len(t) > 0),
       |cells AS (
       |  SELECT r, ($cell) % 256 AS bucket, count(*) AS cnt
       |  FROM tk, (SELECT unnest([0, 1, 2, 3]) AS r)
       |  GROUP BY 1, 2),
       |probes AS (
       |  SELECT term, r, ($probe) % 256 AS bucket
       |  FROM (SELECT unnest(['dup', 'merge', 'spark']) AS term),
       |    (SELECT unnest([0, 1, 2, 3]) AS r)),
       |est AS (
       |  SELECT term, cast(min(coalesce(cnt, 0)) AS bigint) AS est
       |  FROM probes LEFT JOIN cells USING (r, bucket)
       |  GROUP BY term),
       |ex AS (
       |  SELECT t AS term, cast(count(*) AS bigint) AS exact
       |  FROM tk WHERE t IN ('dup', 'merge', 'spark') GROUP BY 1)
       |SELECT term, est, coalesce(exact, 0) AS exact
       |FROM est LEFT JOIN ex USING (term)
       |ORDER BY term""".stripMargin
  }

  private[queries] lazy val fuzzyPairsCtes: String =
    s"""$fuzzyBaseCtes,
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM banded a JOIN banded b ON a.bkey = b.bkey
       |  WHERE a.doc_id < b.doc_id),
       |pairs AS (SELECT * FROM (
       |  SELECT c.id_a, c.id_b,
       |    cast(len(list_intersect(a.s, b.s)) AS double)
       |      / cast(len(list_distinct(list_concat(a.s, b.s))) AS double)
       |      AS jaccard
       |  FROM cand c
       |  JOIN dsh a ON a.doc_id = c.id_a
       |  JOIN dsh b ON b.doc_id = c.id_b)
       |  WHERE jaccard >= 0.5)""".stripMargin

  /** Recursive-closure replay of cluster assignment: transitive
    * reachability over the (tiny, verified) pair graph, cluster = min
    * reachable id — the declarative fixpoint BOTH iterative Spark
    * implementations (min-label propagation q49, star contraction q54)
    * converge to.
    */
  /** Shared BPE-training CTE chain (q89/q102): word counts → char-spaced
    * vocab forms → `rounds` chained (pair count, best pair `b{r}`,
    * merged vocab `w{r}`) rounds.
    */
  private[queries] def bpeTrainCtes(rounds: Int): String = {
    def roundCtes(r: Int) =
      s"""t$r AS (SELECT cnt, string_split(trim(s), '  ') AS t
         |  FROM w${r - 1}),
         |i$r AS (SELECT cnt, t, unnest(generate_series(1, len(t) - 1)) AS i
         |  FROM t$r WHERE len(t) >= 2),
         |p$r AS (SELECT t[i] AS l, t[i + 1] AS r,
         |    cast(sum(cnt) AS bigint) AS c
         |  FROM i$r GROUP BY 1, 2),
         |b$r AS (SELECT l, r, c FROM p$r ORDER BY c DESC, l, r LIMIT 1),
         |w$r AS (SELECT regexp_replace(w.s,
         |    ' ' || b.l || '  ' || b.r || ' ',
         |    ' ' || b.l || b.r || ' ', 'g') AS s, w.cnt
         |  FROM w${r - 1} w, b$r b)""".stripMargin
    s"""wc AS (
       |  SELECT w, count(*) AS cnt FROM (
       |    SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w
       |    FROM documents) GROUP BY w),
       |w0 AS (
       |  SELECT ' ' || array_to_string(string_split(w, ''), '  ') || ' '
       |    AS s, cnt FROM wc),
       |${(1 to rounds).map(roundCtes).mkString(",\n")}""".stripMargin
  }

  /** Shared closure CTEs: fuzzy pairs → symmetric edges → transitive
    * reachability → per-node min-reachable cluster label (`cl`).
    */
  private[queries] lazy val clusterCtes: String =
    s"""$fuzzyPairsCtes,
       |edges AS (
       |  SELECT id_a AS a, id_b AS b FROM pairs
       |  UNION SELECT id_b, id_a FROM pairs),
       |reach(a, b) AS (
       |  SELECT a, b FROM edges
       |  UNION
       |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
       |nodes AS (SELECT DISTINCT a AS id FROM edges),
       |cl AS (
       |  SELECT n.id, least(n.id, min(r.b)) AS cluster
       |  FROM nodes n JOIN reach r ON r.a = n.id
       |  GROUP BY n.id)""".stripMargin

  private[queries] lazy val dedupClustersOracle: String =
    s"""WITH RECURSIVE $clusterCtes
       |SELECT id, cluster FROM cl ORDER BY id""".stripMargin

  private[queries] def markerSql(words: Seq[String]): String = {
    val arr = words.map(w => s"'$w'").mkString("[", ", ", "]")
    s"len(list_filter(string_split_regex(trim(lower(text)), '\\s+'), t -> list_contains($arr, t)))"
  }

  private[queries] def rpDotSqlFor(v: String, j: Int): String = {
    // the (stride, phase) pair is computed HERE so the SQL literal
    // matches Similarity.rpDot's family exactly
    val (a, b) = (1 + j % 3, (j / 3) % 7)
    s"""list_reduce(list_prepend(0.0, list_transform(range(len($v)),
       |  i -> cast($v[i+1] AS double) * (((i*$a + $b) % 7) - 3))),
       |  (a, b) -> a + b)""".stripMargin
  }

  private[queries] def bucketSqlFor(v: String): String =
    (0 until 8).map(j =>
      s"(CASE WHEN (${rpDotSqlFor(v, j)}) > 0 THEN ${1L << j} ELSE 0 END)")
      .mkString(" + ")

  private[queries] val bucketSql: String = bucketSqlFor("embedding")

  /** DuckDB replay of `Multimodal.DecodeKernel.frameFeature`: the exact
    * integer correlation of a frame's byte window with the fixed filter
    * bank w(i,t) = ((t mod 64)·31 + i·17) mod 7 − 3, bytes parsed from
    * a hex(encode(text)) column `hx` in scope (uppercase digits).
    * `off`/`cnt` are SQL expressions for the window start/length; the
    * sum round-trips through REAL to mirror the kernel's float cast
    * (identity below 2^24 — the cast is belt-and-braces).
    */
  private[queries] def mediaFeatureSqlFor(off: String, cnt: String): String =
    s"""list_transform(range(8), i ->
       |  cast(cast(coalesce(list_sum(list_transform(range($cnt), t ->
       |    ((((t % 64) * 31 + i * 17) % 7) - 3) *
       |    ((strpos('0123456789ABCDEF',
       |        substr(hx, cast(2*(($off)+t)+1 AS int), 1)) - 1) * 16
       |      + (strpos('0123456789ABCDEF',
       |        substr(hx, cast(2*(($off)+t)+2 AS int), 1)) - 1)))), 0)
       |    AS real) AS double))""".stripMargin

}
