package graft

/** Executable version of the PLANS.md audit: the scale-critical physical
  * plan properties are asserted, not just documented, so a future change
  * that silently degrades a plan (broadcast lost to a shuffle join,
  * top-k falling back to a global sort, a pruned scan widening) fails
  * the build rather than the next 100 TB run.
  */
class PlanAuditSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf0001)
      .queryExecution.executedPlan.toString()

  test("q06 flat join broadcasts the dimension sides") {
    val p = plan("q06_flat_join")
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join in:\n$p")
  }

  test("q13 top-k compiles to TakeOrderedAndProject, not a global sort") {
    val p = plan("q13_topk")
    assert(p.contains("TakeOrderedAndProject"), s"no top-k operator in:\n$p")
  }

  test("q01 aggregation is partial before the shuffle (map-side combine)") {
    val p = plan("q01_agg_sum")
    assert(p.contains("partial_"), s"no partial aggregate in:\n$p")
  }

  test("q22 scan prunes to the referenced columns only") {
    val p = plan("q22_text_tokens")
    // documents carries lang/n_chars etc. — a projection of doc_id+text
    // must not read them
    assert(p.contains("ReadSchema"), p)
    assert(!"ReadSchema[^\\n]*lang".r.findFirstIn(p).isDefined,
      s"unpruned scan reads lang:\n$p")
  }

  test("q35 near-dup candidates are bucket-local, single upstream pass") {
    val p = plan("q35_embedding_neardup")
    // one shuffle keyed on the RP bucket, no self-join (which would
    // compute the upstream feature pipeline twice)
    assert(p.contains("bucket#"), s"no bucket key in:\n$p")
    assert(!p.contains("Join"), s"self-join shape in:\n$p")
  }

  test("q37 simhash candidates join on tbl+block-pair keys") {
    val p = plan("q37_simhash")
    assert(p.contains("bkey"), s"no block-pair key in:\n$p")
  }

  test("q28 similarity scoring stays on the codegen'd kernel") {
    val p = plan("q28_cosine_topk")
    assert(p.toLowerCase.contains("vecdot"), s"no VecDot kernel in:\n$p")
  }

  test("q30 ANN probe is a pre-score filter, not a post-join one") {
    val p = plan("q30_ann_topk")
    assert(!p.contains("NestedLoop"), s"crossJoin shape in:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"no top-k operator in:\n$p")
  }

  test("q65 IVF probe is a pre-score filter on the codegen'd kernel") {
    val p = plan("q65_ivf_ann")
    assert(!p.contains("NestedLoop"), s"crossJoin shape in:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"no top-k operator in:\n$p")
    assert(p.toLowerCase.contains("vecdot"), s"no VecDot kernel in:\n$p")
  }

  test("q66 KMV sketch aggregates partially before the shuffle") {
    // the no-distinct-shuffle claim: k-element buffers must combine
    // map-side, so only groups x k doubles cross the wire
    val p = plan("q66_kmv_distinct")
    assert(p.contains("partial_"), s"no partial aggregate in:\n$p")
  }

  test("q53 at-rest ANN scan prunes partitions via the probe IN-list") {
    val p = plan("q53_ann_at_rest")
    assert("PartitionFilters: \\[[^\\]]*bucket".r.findFirstIn(p).isDefined,
      s"no bucket PartitionFilters in:\n$p")
  }

  test("q74 bloom probe filters the fact side BEFORE the join") {
    val p = plan("q74_bloom_join")
    assert(p.contains("might_contain"), s"no bloom probe in:\n$p")
    // the probe must sit under the join, not above it — i.e. the plan
    // string shows the filter on the scan side
    val joinIdx = p.indexOf("Join")
    val probeIdx = p.indexOf("might_contain")
    assert(joinIdx >= 0 && probeIdx > joinIdx,
      s"bloom probe not below the join in:\n$p")
  }

  test("q77 at-rest IVF scan prunes cell partitions via the probe IN-list") {
    val p = plan("q77_ivf_at_rest")
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(p).isDefined,
      s"no cell PartitionFilters in:\n$p")
  }

  test("q235 at-rest hier IVF scan prunes BOTH partition levels " +
      "(sup, then cell) via planning-time IN-lists") {
    val p = plan("q235_ivf_hier_at_rest")
    val pf = "PartitionFilters: \\[[^\\]]*\\]".r.findAllIn(p).toSeq
    assert(pf.exists(f => f.contains("sup") && f.contains("cell")),
      s"expected sup AND cell in one scan's PartitionFilters, got " +
        s"$pf in:\n$p")
  }

  test("q236 at-rest IVF-PQ scan prunes cell partitions AND reads " +
      "only (id, codes) — never a float vector column") {
    val p = plan("q236_ivfpq_at_rest")
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(p).isDefined,
      s"no cell PartitionFilters in:\n$p")
    val reads = "ReadSchema: [^\\n]*".r.findAllIn(p).toSeq
    assert(reads.exists(_.contains("codes")),
      s"no codes column in any ReadSchema:\n$p")
    assert(!reads.exists(_.contains("embedding")),
      s"at-rest PQ search read a raw vector column:\n$p")
  }

  test("q238 rerank tail broadcasts the ADC pool to the source " +
      "vectors — the cell-pruned code scan stays, no corpus shuffle") {
    val p = plan("q238_ivfpq_rerank")
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(p).isDefined,
      s"no cell PartitionFilters in:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"rerank pool not broadcast in:\n$p")
  }

  test("q240 hier+PQ at rest prunes BOTH partition levels AND reads " +
      "only the code column") {
    val p = plan("q240_ivfpq_hier_at_rest")
    val pf = "PartitionFilters: \\[[^\\]]*\\]".r.findAllIn(p).toSeq
    assert(pf.exists(f => f.contains("sup") && f.contains("cell")),
      s"expected sup AND cell in one scan's PartitionFilters, got " +
        s"$pf in:\n$p")
    val reads = "ReadSchema: [^\\n]*".r.findAllIn(p).toSeq
    assert(reads.exists(_.contains("codes")),
      s"no codes column in any ReadSchema:\n$p")
    assert(!reads.exists(r => r.contains("\"v\"") || r.contains("embedding")),
      s"hier+PQ search read a raw vector column:\n$p")
  }

  test("q07 RI filter is a semi-join, not a distinct+inner join") {
    val p = plan("q07_semi_join")
    assert(p.contains("LeftSemi"), s"no semi join in:\n$p")
  }

  test("q08 warehouse novelty probe is an anti-join") {
    val p = plan("q08_anti_join")
    assert(p.contains("LeftAnti"), s"no anti join in:\n$p")
  }

  test("q80 BM25 df table is broadcast; postings filter precedes its shuffle") {
    val p = plan("q80_bm25")
    assert(p.contains("BroadcastHashJoin"), s"df side not broadcast in:\n$p")
    // the term IN-filter must sit below the first aggregate exchange so
    // the shuffle carries matching postings only
    val filterIdx = p.indexOf("t#")
    assert(p.contains("TakeOrderedAndProject"), s"no top-k operator in:\n$p")
    assert(filterIdx >= 0, s"no term filter in:\n$p")
  }

  test("q82 SemDeDup pairs are cluster-local: no self-join, no cartesian") {
    val p = plan("q82_semantic_dedup")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      s"quadratic join shape in:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"self-join shape (assignment computed twice) in:\n$p")
  }

  test("q83 set-sim join never goes quadratic") {
    val p = plan("q83_setsim_join")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      s"quadratic join shape in:\n$p")
  }

  test("q90 SCD2 runs on ONE user-partition exchange (both window passes)") {
    val p = plan("q90_scd2")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"expected 1 user-partition exchange, " +
      s"got $exchanges in:\n$p")
  }

  test("q91 duplicated-window pipeline is linear: no self-join; the " +
      "one-row-per-doc completion is a broadcast") {
    val p = plan("q91_dup_windows")
    // the window stats themselves must stay a single linear pass (a
    // self-join would recompute the shingle explode); the per-doc
    // completion left-join (zero-window docs re-enter) broadcasts the
    // aggregated stats onto an id-only scan — one BroadcastHashJoin,
    // nothing shuffled twice
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"shuffle-join shape in:\n$p")
    assert(p.count(_ == 'J') >= 0 &&
      "BroadcastHashJoin".r.findAllIn(p).size <= 1,
      s"more than the completion join in:\n$p")
  }

  test("q92 logit scorer aggregates partially before the doc shuffle") {
    val p = plan("q92_quality_logit")
    assert(p.contains("partial_"), s"no map-side combine in:\n$p")
  }

  test("q95 triangle counting never goes quadratic") {
    val p = plan("q95_triangles")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      s"quadratic join shape in:\n$p")
  }

  test("q96 mixture order has no global single-partition sort before ranks") {
    val p = plan("q96_mix_order")
    // the per-source pos window partitions by source; the final orderBy
    // is presentation-only (rangepartitioning) — what must NOT appear is
    // a SinglePartition exchange feeding a row_number
    assert(!p.contains("Exchange SinglePartition"),
      s"single-partition global sort in:\n$p")
  }

  test("q97 sampled quantiles aggregate partially (mergeable buffers)") {
    val p = plan("q97_sample_quantiles")
    assert(p.contains("partial_"), s"no map-side combine in:\n$p")
  }

  test("q106 edit-distance join never goes quadratic (gram-tuple equi-join)") {
    val p = plan("q106_editdist_join")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      s"quadratic join shape in:\n$p")
  }

  test("q107 bigram LM: count tables aggregate partially, no cartesian") {
    val p = plan("q107_bigram_lm")
    assert(p.contains("partial_"), s"no map-side combine in:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      s"quadratic join shape in:\n$p")
  }

  test("q108 dup spans: digest agg combines map-side; window is per-doc") {
    val p = plan("q108_dup_spans")
    assert(p.contains("partial_"), s"no map-side combine in:\n$p")
    // the interval-merge window partitions by doc — a global
    // single-partition window here would be a scale killer
    assert(!"Window.*\\n.*Exchange SinglePartition".r.findFirstIn(p)
      .isDefined, s"single-partition window in:\n$p")
  }

  test("q124 bucketed join: zero exchange, bucketed scans") {
    val tmp = java.nio.file.Files.createTempDirectory("pa_buck").toString
    graft.ext.Layout.bucketTableWrite(
      graft.Tables.customer(spark, sf0001), "c_custkey", 4,
      "pa_buck_cust", s"$tmp/c")
    graft.ext.Layout.bucketTableWrite(
      graft.Tables.orders(spark, sf0001), "o_custkey", 4,
      "pa_buck_ord", s"$tmp/o")
    // forbid broadcast so the assertion proves the BUCKETED path, not a
    // small-table special case
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = graft.ext.Layout.bucketedJoin(spark, "pa_buck_cust",
        "c_custkey", "pa_buck_ord", "o_custkey")
        .queryExecution.executedPlan.toString()
      assert(p.contains("SortMergeJoin"), s"not a sort-merge join:\n$p")
      assert(!p.contains("Exchange"), s"bucketed join still shuffles:\n$p")
      assert(p.contains("Bucketed: true"), s"scan not bucketed:\n$p")
      // the residual per-partition Sort is shuffle-free; Spark only
      // consumes sortBy ordering under the legacy one-file-per-bucket
      // scan flag, so the zero-EXCHANGE property is the scale claim
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q151 sorted-neighborhood: no quadratic join; window is per-block") {
    val p = plan("q151_sorted_neighborhood")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      s"quadratic join shape in:\n$p")
    // the neighborhood window partitions by the block key — a global
    // single-partition window would serialize the corpus sort
    assert(!"Window.*\\n.*Exchange SinglePartition".r.findFirstIn(p)
      .isDefined, s"single-partition window in:\n$p")
    // verify runs on the codegen'd hash-set kernel, not array_intersect
    assert(p.contains("stringintersectsize") ||
      p.toLowerCase.contains("stringintersectsize"),
      s"no intersect kernel in:\n$p")
  }

  test("q152 KS: both sides aggregate partially before the value merge") {
    val p = plan("q152_ks_drift")
    assert(p.contains("partial_"), s"no map-side combine in:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in:\n$p")
  }

  test("q154 survivorship: every stage keys on the cluster hash, no cartesian") {
    val p = plan("q154_survivorship")
    assert(p.contains("partial_"), s"no map-side combine in:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      s"quadratic join shape in:\n$p")
  }

  test("q156 equi-width hist: bounds are broadcast back, counts combine map-side") {
    val p = plan("q156_hist_equiwidth")
    assert(p.contains("BroadcastHashJoin"), s"bounds not broadcast in:\n$p")
    assert(p.contains("partial_"), s"no map-side combine in:\n$p")
  }

  test("q148 CDC apply: latest-wins window is per-key, never global") {
    val p = plan("q148_cdc_apply")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      s"quadratic join shape in:\n$p")
    assert(!"Window.*\\n.*Exchange SinglePartition".r.findFirstIn(p)
      .isDefined, s"single-partition window in:\n$p")
  }

  test("q150 HLL registers combine map-side (mergeable sketch)") {
    val p = plan("q150_hll_distinct")
    assert(p.contains("partial_"), s"no map-side combine in:\n$p")
  }

  test("q157 FS linkage: linear neighborhood, per-block window, id-equi scoring joins") {
    val p = plan("q157_linkage")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      s"quadratic join shape in:\n$p")
    // the candidate window partitions by the block key — a global
    // single-partition window would serialize the catalog sort
    assert(!"Window.*\\n.*Exchange SinglePartition".r.findFirstIn(p)
      .isDefined, s"single-partition window in:\n$p")
  }

  test("q158 k-anonymity: one QI-keyed aggregate with map-side combine") {
    val p = plan("q158_kanon")
    assert(p.contains("partial_"), s"no map-side combine in:\n$p")
    assert(!p.contains("Join"), s"unexpected join in:\n$p")
  }

  test("q159 containment: band-keyed candidates, hash-set intersect kernel") {
    val p = plan("q159_containment")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      s"quadratic join shape in:\n$p")
    assert(p.toLowerCase.contains("stringintersectsize"),
      s"no intersect kernel in:\n$p")
  }

  test("q160 LOO encode: category stats broadcast back, fact side unshuffled") {
    val p = plan("q160_target_encode")
    assert(p.contains("BroadcastHashJoin"), s"stats not broadcast in:\n$p")
    assert(p.contains("partial_"), s"no map-side combine in:\n$p")
  }

  test("q161 feature hash: pure projection — no shuffle, no join") {
    val p = plan("q161_feature_hash")
    assert(!p.contains("Join"), s"unexpected join in:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"unexpected shuffle in:\n$p")
  }

  test("q162 sliding HLL: register aggs combine map-side; expand is bounded") {
    val p = plan("q162_sliding_hll")
    assert(p.contains("partial_"), s"no map-side combine in:\n$p")
    assert(!p.contains("Join"), s"self-join shape in:\n$p")
  }

  test("q164 priority sample: top-(n+1) is TakeOrdered, never a global sort") {
    val p = plan("q164_priority_sample")
    assert(p.contains("TakeOrderedAndProject"), s"no top-k operator in:\n$p")
  }

  test("q165 CM sketch: matrix agg combines map-side; probe join broadcasts") {
    val p = plan("q165_cm_sketch")
    assert(p.contains("partial_"), s"no map-side combine in:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"probe join not broadcast in:\n$p")
  }

  test("q166 contamination: bucket-equi join between the sets, no cross join") {
    val p = plan("q166_semantic_contamination")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      s"quadratic join shape in:\n$p")
    assert(p.contains("bucket"), s"no bucket key in:\n$p")
  }

  test("q167 at-rest CM: sum-on-read combines map-side") {
    val p = plan("q167_cm_maintain")
    assert(p.contains("partial_"), s"no map-side combine in:\n$p")
  }

  test("q170 A/B SRM: one distinct + one agg, map-side combined, no join") {
    val p = plan("q170_ab_srm")
    assert(p.contains("partial_"), s"no map-side combine in:\n$p")
    assert(!p.contains("Join"), s"unexpected join in:\n$p")
  }

  test("q169 pair mining: band-keyed candidates, hash-set intersect kernel") {
    val p = plan("q169_pair_mining")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      s"quadratic join shape in:\n$p")
    assert(p.toLowerCase.contains("stringintersectsize"),
      s"no intersect kernel in:\n$p")
  }

  test("q168 explosion audit joins key profiles, not fact rows; top-k not sort") {
    val p = plan("q168_join_explosion")
    assert(p.contains("partial_"), s"profiles not map-side combined in:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"no top-k operator in:\n$p")
  }

  test("q163 PPR rounds iterate the checkpointed edge list, not the fact scan") {
    val p = plan("q163_ppr")
    // the final round's plan must read the materialized edges (a
    // LogicalRDD scan), never re-join lineitem/orders per round
    assert(!p.contains("lineitem"), s"fact scan inside the loop:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      s"quadratic join shape in:\n$p")
  }

  test("q173 Moore-Lewis weight table broadcasts onto the token stream") {
    val p = plan("q173_moore_lewis")
    // corpus-side plan: scan -> explode -> broadcast-hash-join ->
    // partial agg; the vocab-sized weight table must never shuffle the
    // token stream, and the unigram counts must combine map-side
    assert(p.contains("BroadcastHashJoin"), s"weights not broadcast in:\n$p")
    assert(p.contains("partial_"), s"no partial aggregate in:\n$p")
    // the only nested-loop allowed is the benign broadcast 1-row
    // totals cross (the Stats.scala:432 pattern); a real cartesian
    // would plan as CartesianProduct
    assert(!p.contains("CartesianProduct"), s"cartesian in:\n$p")
  }

  test("q175 temperature rates broadcast; thinning is a per-row filter") {
    val p = plan("q175_temperature_sample")
    assert(p.contains("BroadcastHashJoin"), s"rates not broadcast in:\n$p")
    assert(p.contains("partial_"),
      s"stratum counts not map-side combined in:\n$p")
  }

  test("q180 budget take: no single-task window, no driver-built table") {
    // the naive cumulative sum is sum().over(Window.orderBy(...)) with
    // no partitionBy — a partition-less WindowExec that drags the whole
    // corpus through ONE task; a driver-side selection would surface as
    // a LocalTableScan. budgetTake's prefix-offset design has neither.
    val p = plan("q180_budget_select")
    assert(!p.contains("Window"), s"single-task window shape in:\n$p")
    assert(!p.contains("LocalTableScan"), s"driver-built result in:\n$p")
  }

  test("q187/q188 simhash decomposition: aggregated, never quadratic") {
    // groups: map-side-combined sig aggregation + membership join;
    // edges: block join over DISTINCT sigs — neither may plan a
    // cartesian/NLJ, and both must combine signatures map-side
    for (n <- Seq("q187_simhash_groups", "q188_simhash_group_edges")) {
      val p = plan(n)
      assert(p.contains("partial_"), s"no map-side combine in $n:\n$p")
      assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
        s"quadratic join shape in $n:\n$p")
    }
  }

  test("engine-wide: no graded plan contains a partition-less window " +
      "unless its input is provably bounded (allowlisted + documented)") {
    // The round-8 numericDrift escape: a Window.orderBy with no
    // partitionBy plans as ONE task holding the whole input — fine on
    // a bounded table, a scale killer on anything data-growing. This
    // audit walks EVERY graded query's physical plan (AQE off, so the
    // tree is collectable; subqueries included) and fails on any
    // partition-less WindowExec whose query is not on the explicit
    // allowlist below. Each allowlist entry documents WHY the window's
    // input cannot grow with the data — the next numericDrift cannot
    // ship silently.
    val allow: Map[String, String] = Map(
      "q153_rrf_fusion" -> ("both rank windows run on post-top-k " +
        "retrieval lists (<= 20 rows, driver-chosen constants)"),
      "q179_priority_at_rest" -> ("priorityFinalize's windows run " +
        "above an orderBy().limit(n+1) — input is <= n+1 rows by " +
        "construction (the mergeable-sketch contract)"),
      "q184_embedding_drift" -> ("centroidDrift's window input is " +
        "one row per RP bucket — 2^bits rows, a driver-chosen " +
        "constant"),
      "q143_dict" -> ("dictBuild's window input is the distinct " +
        "table MEASURED <= maxSingleTask (2M) — above the guard the " +
        "build switches to the bucketed two-phase rank (Round9Spec); " +
        "the subtree appears twice because the dict is joined twice"),
      "q147_numeric_drift" -> ("numericDrift's windows run on the " +
        "merged distinct-value support MEASURED <= maxSingleTask " +
        "(2M) — above the guard the prefix sums switch to the " +
        "bucketed two-phase form (Round9Spec pins both paths against " +
        "a BigInt oracle and the above-guard plan shape)"),
      "q152_ks_drift" -> ("ksDrift's windows run on the merged " +
        "distinct-value support MEASURED <= maxSingleTask (2M) — " +
        "above the guard the cumulative switches to the bucketed " +
        "two-phase form (Round9Spec)"),
      "q109_skyline" -> ("paretoFrontier's running-max window runs " +
        "on the per-distinct-x table MEASURED <= maxSingleTask (2M) " +
        "— above the guard it switches to the bucketed two-phase " +
        "running max (Round9Spec)"),
      "q164_priority_sample" -> ("priorityFinalize's windows run " +
        "above an orderBy().limit(n+1) — input is <= n+1 rows by " +
        "construction")
    )
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1)
      .flatMap { case (name, fn) =>
        val ws = partitionlessWindows(fn(spark, sf0001))
        if (ws.nonEmpty) Some(name -> ws.size) else None
      }
    val unexplained = offenders.filterNot { case (n, _) => allow.contains(n) }
    assert(unexplained.isEmpty,
      s"partition-less windows outside the allowlist: $unexplained")
    // and the allowlist itself must not go stale: every entry still
    // names a live query that still plans a partition-less window
    val offenderNames = offenders.map(_._1).toSet
    val stale = allow.keys.filterNot(offenderNames.contains)
    assert(stale.isEmpty, s"stale allowlist entries: $stale")
  }

  test("q171/q172 table-valued mixes: weights stay distributed") {
    // the bounded-strata variants (q96/q101) hold a strata->weight map
    // on the driver; the table-valued variants must NOT — a collected
    // weight table would re-enter the plan as a LocalTableScan, and a
    // global position as a partition-less Window. (The pre-zipWithIndex
    // stages run inside the RDD lineage; a driver detour would still be
    // visible here as a local relation.)
    for (n <- Seq("q171_mix_by_table", "q172_epoch_mix_table")) {
      val p = plan(n)
      assert(!p.contains("LocalTableScan"),
        s"driver-collected table in $n:\n$p")
      assert(!p.contains("CartesianProduct"), s"cartesian in $n:\n$p")
    }
  }
}
