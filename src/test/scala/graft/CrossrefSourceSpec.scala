package graft

import org.apache.spark.sql.functions._

/** DataSource V2 connector: work-grain rows, partition-per-file
  * parallelism, column pruning, and agreement with the JSON-reader
  * ingest path.
  */
class CrossrefSourceSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dsv2 = spark.read
    .format("graft.sources.CrossrefSource")
    .load(resource("crossref"))

  test("reads one row per work across page files") {
    // fixture: 4 + 1 + 3 + 0 items (incl. empty-DOI and dup rows)
    assert(dsv2.count() == 7)
    assert(dsv2.rdd.getNumPartitions == 3) // one partition per page file
  }

  test("agrees with the built-in JSON reader path") {
    val viaJson = graft.ingest.Crossref
      .readPages(spark, resource("crossref"))
      .select(col("item.DOI").as("DOI"), col("item.publisher"))
      .filter(length(col("DOI")) > 0)
      .orderBy("DOI")
      .as[(String, String)].collect().toSeq
    val viaDsv2 = dsv2.select(col("DOI"), col("publisher"))
      .filter(length(col("DOI")) > 0)
      .orderBy("DOI")
      .as[(String, String)].collect().toSeq
    assert(viaDsv2 == viaJson)
  }

  test("column pruning reaches the reader") {
    val q = dsv2.select("DOI")
    val scans = q.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.nonEmpty)
    assert(scans.head.output.map(_.name) == Seq("DOI"))
  }

  test("nested author/affiliation structures survive the conversion") {
    val affs = dsv2
      .filter(col("DOI") === "https://doi.org/10.1/AAA")
      .select(explode(col("author")).as("au"))
      .select(col("au.given"), explode(col("au.affiliation")).as("aff"))
      .select("given", "aff.name")
      .as[(String, String)].collect().toSet
    assert(affs == Set(
      ("José", "Universidad Polit&eacute;cnica Salesiana, Cuenca, Ecuador"),
      ("Anna", "University of California, U.S.A.")))
  }
}
