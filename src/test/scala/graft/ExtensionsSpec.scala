package graft

import org.apache.spark.sql.functions._

import graft.functions.{VecDot, VecDotRewrite, VectorFunctions}

/** The VecDot custom expression and the HOF→kernel optimizer rule. */
class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
    (Array(0.5f, -1.5f, 2.5f), Array(-2.0f, 0.25f, 8.0f)),
  ).toDF("a", "b")

  private def hofDot = aggregate(
    zip_with($"a", $"b", (x, y) => x.cast("double") * y.cast("double")),
    lit(0.0), (acc, v) => acc + v)

  test("VecDot equals the interpreted HOF fold bit-for-bit") {
    val kernel = vecs.select(VectorFunctions.vecDot($"a", $"b"))
      .as[Double].collect().toSeq
    val hof = vecs.select(hofDot).as[Double].collect().toSeq
    assert(kernel == hof)
    assert(kernel(0) == 32.0)
  }

  test("VecDot null and length-mismatch behavior") {
    val df = Seq(
      (Some(Array(1.0f, 2.0f)), Some(Array(3.0f))), // min-length semantics
      (None, Some(Array(1.0f)))).toDF("a", "b")
    val got = df.select(VectorFunctions.vecDot($"a", $"b"))
      .collect().map(r => Option(r.get(0)))
    assert(got(0).contains(3.0))
    assert(got(1).isEmpty)
  }

  test("VecDotRewrite rewrites the declarative pattern in the plan") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ VecDotRewrite
    try {
      // parquet-backed source — a literal-backed frame would be fully
      // constant-folded before the rule could be observed
      val emb = Tables.embeddings(spark, sf0001).limit(20)
        .select($"vec_id", $"embedding".as("a"), $"embedding".as("b"))
      val q = emb.select($"vec_id", hofDot.as("d"))
      val optimized = q.queryExecution.optimizedPlan
      val hasKernel = optimized.collect { case n => n }
        .flatMap(_.expressions).exists(_.exists {
          case _: VecDot => true; case _ => false
        })
      assert(hasKernel, s"no VecDot in:\n$optimized")
      val viaRule = q.orderBy("vec_id").select("d").as[Double].collect().toSeq
      val direct = emb.select($"vec_id",
        VectorFunctions.vecDot($"a", $"b").as("d"))
        .orderBy("vec_id").select("d").as[Double].collect().toSeq
      assert(viaRule == direct)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == VecDotRewrite)
    }
  }

  test("CollapseRollupExplode removes the generator when enabled") {
    import graft.functions.CollapseRollupExplode
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ CollapseRollupExplode
    try {
      def roundTrip = Tables.lineitem(spark, sf0001)
        .groupBy("l_orderkey")
        .agg(concat_ws("; ",
          array_sort(collect_set($"l_returnflag"))).as("flags"))
        .select(explode(split($"flags", "; ")).as("flag"))
        .groupBy("flag").count().orderBy("flag")
      val expected = roundTrip.as[(String, Long)].collect().toSeq

      spark.conf.set("spark.graft.collapseRollupExplode", "true")
      val optimized = roundTrip
      val hasGenerate = optimized.queryExecution.optimizedPlan
        .collect { case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g }
      assert(hasGenerate.isEmpty,
        s"generator survived:\n${optimized.queryExecution.optimizedPlan}")
      assert(optimized.as[(String, Long)].collect().toSeq == expected)
    } finally {
      spark.conf.set("spark.graft.collapseRollupExplode", "false")
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_ == graft.functions.CollapseRollupExplode)
    }
  }

  test("IntersectSizeRewrite fires on the guarded pattern only") {
    import graft.functions.{IntersectSizeRewrite, StringIntersectSize}
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ IntersectSizeRewrite
    try {
      val docs = Tables.documents(spark, sf0001).limit(30)
        .select($"doc_id", split(trim($"text"), "\\s+").as("x"),
          slice(split(trim($"text"), "\\s+"), 1, 5).as("y"))
      def kernelIn(q: org.apache.spark.sql.DataFrame): Boolean =
        q.queryExecution.optimizedPlan.collect { case n => n }
          .flatMap(_.expressions).exists(_.exists {
            case _: StringIntersectSize => true; case _ => false
          })
      val guarded = docs.select($"doc_id",
        size(array_intersect(array_distinct($"x"), array_distinct($"y")))
          .as("n"))
      assert(kernelIn(guarded),
        s"no kernel in:\n${guarded.queryExecution.optimizedPlan}")
      // values must match the un-rewritten computation exactly
      val want = docs.select($"doc_id",
        size(array_intersect(array_distinct($"x"),
          array_distinct($"y"))).as("n"))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_ == IntersectSizeRewrite)
      val ref = want.orderBy("doc_id").as[(Long, Int)].collect().toSeq
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ IntersectSizeRewrite
      assert(guarded.orderBy("doc_id").as[(Long, Int)].collect().toSeq
        === ref)
      // duplicates change array_intersect's semantics vs the kernel —
      // the bare (unguarded) pattern must NOT be rewritten
      val bare = docs.select(size(array_intersect($"x", $"y")).as("n"))
      assert(!kernelIn(bare),
        s"kernel fired on unguarded inputs:\n${bare.queryExecution.optimizedPlan}")
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_ == graft.functions.IntersectSizeRewrite)
    }
  }

  test("word_shingles SQL function via extensions class") {
    // register through the same injection path the extensions class uses
    new graft.functions.GraftExtensions()
    val sh = Seq("a b c d").toDF("t")
      .select(graft.functions.ShingleFunctions.wordShingles($"t", 2))
      .as[Seq[String]].head()
    assert(sh == Seq("a b", "b c", "c d"))
  }
}
