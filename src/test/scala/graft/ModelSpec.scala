package graft

import java.nio.file.Files

/** Typed model + SQL view surface over a freshly-built fixture warehouse. */
class ModelSpec extends SparkSpec {
  import spark.implicits._

  test("typed accessors and spark.sql over the warehouse") {
    val dir = Files.createTempDirectory("graft_model").toString
    Pipeline.runAll(spark, resource("crossref"),
      resource("ups_institucional.csv"), dir)

    val obras = graft.model.Model.obras(spark, dir).collect()
    assert(obras.length == 4)
    assert(obras.forall(_.anio.exists(y => y >= 2022 && y <= 2025)))

    val vista = graft.model.Model.vista(spark, dir)
    assert(vista.filter(_.upsFlag).count() == 4)

    graft.model.Model.registerWarehouseViews(spark, dir)
    val byYear = spark.sql(
      """SELECT anio, count(*) n FROM vista_analisis
        |GROUP BY anio ORDER BY anio""".stripMargin)
      .as[(Int, Long)].collect().toSeq
    assert(byYear == Seq((2022, 1L), (2023, 1L), (2024, 1L), (2025, 1L)))
    // registered normalization UDFs usable from SQL
    assert(spark.sql("SELECT norm_key('Politécnica  UPS')").as[String]
      .head() == "politecnica ups")
  }

  test("testdata views for ad-hoc SQL") {
    graft.model.Model.registerTestdataViews(spark, sf0001)
    assert(spark.sql("SELECT count(*) FROM lineitem").as[Long].head() > 0)
    assert(spark.sql(
      "SELECT count(*) FROM events WHERE ts IS NOT NULL").as[Long]
      .head() > 0)
  }
}
