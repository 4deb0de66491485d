package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev microbenchmark: where does q106 (edit-distance join) spend time? */
object Scratch2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dDir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"== $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    val base0 = Tables.customer(spark, dDir)
      .select(col("c_custkey").cast("long").as("id"), col("c_name").as("s"),
        length(col("c_name")).as("len"))
    base0.count() // warm
    val d = 1; val q = 3; val c = 3
    val minLen = q * (d + 1)
    val p = q * d + c
    val base = base0
    val long = base.filter(col("len") >= minLen)
    val grams = long.select(col("id"),
      explode(array_distinct(transform(
        sequence(lit(1), col("len") - (q - 1)),
        i => col("s").substr(i, lit(q))))).as("g"))
    time("gram explode")(grams.count())
    val gdf = grams.groupBy("g").agg(count(lit(1)).as("dfc"))
    time("gram df")(gdf.count())
    val ranked = grams.join(gdf, "g")
      .groupBy("id")
      .agg(slice(sort_array(collect_list(struct(col("dfc"), col("g")))),
        1, p).as("pgx"))
      .join(long.select(col("id"), col("s")), "id")
      .select(col("id"), col("s"),
        transform(col("pgx"), x => x.getField("g")).as("pg"),
        size(col("pgx")).as("np"))
      .persist()
    time("ranked build")(ranked.count())
    val combos = (0 until p).combinations(c).toSeq
    println(s"== combos: ${combos.size}")
    val comboArr = array(combos.map(ix =>
      struct(ix.zipWithIndex.map { case (i, slot) =>
        element_at(col("pg"), i + 1).as(s"g$slot") }: _*)): _*)
    val rich = ranked.filter(col("np") === p)
      .select(col("id"), col("s"), explode(comboArr).as("key"))
    time("rich explode")(rich.count())
    val richCand = rich
      .select(col("key"), col("id").as("ia"), col("s").as("sa"))
      .join(rich.select(col("key"), col("id").as("ib"),
        col("s").as("sb")), "key")
      .filter(col("ia") < col("ib"))
      .select("ia", "ib", "sa", "sb")
    time("richCand join")(richCand.count())
    val sparseSingles = ranked.filter(col("np") < p)
      .select(col("id").as("ja"), col("s").as("ta"),
        explode(col("pg")).as("g"))
    val prefixSingles = ranked
      .select(col("id").as("jb"), col("s").as("tb"),
        explode(slice(col("pg"), 1, q * d + 1)).as("g"))
    val sparseCand = sparseSingles.join(prefixSingles, "g")
      .filter(col("ja") =!= col("jb"))
      .select(least(col("ja"), col("jb")).as("ia"),
        greatest(col("ja"), col("jb")).as("ib"),
        when(col("ja") < col("jb"), col("ta")).otherwise(col("tb")).as("sa"),
        when(col("ja") < col("jb"), col("tb")).otherwise(col("ta")).as("sb"))
    time("sparseCand")(sparseCand.count())
    val shortA = base.filter(col("len") < minLen)
      .select(col("id").as("ja"), col("s").as("ta"),
        explode(sequence(greatest(lit(0), col("len") - d),
          col("len") + d)).as("lb"))
    val shortB = base.filter(col("len") < minLen + d)
      .select(col("id").as("jb"), col("s").as("tb"),
        col("len").as("lb"))
    val shortCand = shortA.join(shortB, "lb")
      .filter(col("ja") =!= col("jb"))
      .select(least(col("ja"), col("jb")).as("ia"),
        greatest(col("ja"), col("jb")).as("ib"),
        when(col("ja") < col("jb"), col("ta")).otherwise(col("tb")).as("sa"),
        when(col("ja") < col("jb"), col("tb")).otherwise(col("ta")).as("sb"))
    time("shortCand")(shortCand.count())
    val all = richCand.unionByName(sparseCand).unionByName(shortCand)
      .filter(abs(length(col("sa")) - length(col("sb"))) <= d)
    time("union+lenfilter")(all.count())
    val verified = all
      .withColumn("dist", levenshtein(col("sa"), col("sb"), d))
      .filter(col("dist") >= 0)
    time("verify")(verified.count())
    time("distinct")(verified
      .select(col("ia").as("id_a"), col("ib").as("id_b"), col("dist"))
      .distinct().count())
    time("full op pass2")(graft.ext.Dedup.editDistanceJoin(
      base0.select("id", "s"), "id", "s", d = 1).count())
    spark.stop()
  }
}
