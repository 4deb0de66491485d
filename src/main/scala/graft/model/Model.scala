package graft.model

import java.sql.Date

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.etl.Warehouse

/** Typed view of the warehouse (schemas from FIXTURES.md §3 / reference
  * DDL PIPE:208-309). `DataFrame` remains the engine's working currency;
  * these case classes are the library-user surface where compile-time
  * field checks help (joins against the warehouse from user code).
  */
case class Obra(doi: String, titulo: String, anio: Option[Int],
    revista: String, editorial: String, tipo: String, citas: Option[Int],
    referencias: Option[Int], fechaPublicacion: Option[Date])

case class Autor(autorId: Long, nombreLimpio: String,
    nombreBusqueda: String, orcid: Option[String])

case class Afiliacion(afiliacionId: Long, cadenaLiteral: String,
    afiliacionBusqueda: String, sedeId: Option[Int],
    countryCode: Option[String], countryName: Option[String],
    esUps: Boolean)

case class ObraAutorAfiliacion(doi: String, autorId: Long,
    afiliacionId: Long, autorSecuencia: Option[String])

case class ObraTema(doi: String, tema: String)

case class SedeArea(sedeId: Int, sede: String, areaAcademica: String,
    palabrasClave: String)

case class VistaAnalisis(doi: String, titulo: String, anio: Option[Int],
    revista: String, editorial: String, tipo: String, citas: Option[Int],
    referencias: Option[Int], fechaPublicacion: Option[Date],
    autores: String, afiliaciones: String, sedes: String, areas: String,
    paises: String, paisesCodigo: String, upsFlag: Boolean,
    temas: Option[String])

/** Typed accessors + SQL view registration. */
object Model {

  def obras(spark: SparkSession, dir: String): Dataset[Obra] = {
    import spark.implicits._
    Warehouse.read(spark, dir, "obras")
      .select("doi", "titulo", "anio", "revista", "editorial", "tipo",
        "citas", "referencias", "fechaPublicacion").as[Obra]
  }

  def autores(spark: SparkSession, dir: String): Dataset[Autor] = {
    import spark.implicits._
    Warehouse.read(spark, dir, "autores").as[Autor]
  }

  def afiliaciones(spark: SparkSession, dir: String): Dataset[Afiliacion] = {
    import spark.implicits._
    Warehouse.read(spark, dir, "afiliaciones").as[Afiliacion]
  }

  def vista(spark: SparkSession, dir: String): Dataset[VistaAnalisis] = {
    import spark.implicits._
    Warehouse.read(spark, dir, "vista_analisis").as[VistaAnalisis]
  }

  private val warehouseTables = Seq("obras", "autores", "afiliaciones",
    "obra_autor_afiliacion", "obra_tema", "sedes_areas", "vista_analisis",
    "runs", "obras_clean", "oaa_clean")

  /** Register every existing warehouse table as a temp view (plus the
    * normalization UDFs) so `spark.sql` works over the warehouse — the
    * engine-side equivalent of the reference's Superset SQL surface
    * (TECHDOC §2.3).
    */
  def registerWarehouseViews(spark: SparkSession, dir: String): Unit = {
    graft.norm.Normalize.register(spark)
    warehouseTables.foreach { t =>
      if (Warehouse.exists(spark, dir, t))
        Warehouse.read(spark, dir, t).createOrReplaceTempView(t)
    }
  }

  /** Register the driver TESTDATA tables as temp views. */
  def registerTestdataViews(spark: SparkSession, sfDir: String): Unit = {
    graft.norm.Normalize.register(spark)
    graft.Tables.testdataNames.filterNot(_ == "events").foreach { t =>
      graft.Tables.table(spark, sfDir, t).createOrReplaceTempView(t)
    }
    // events goes through its loader (TIMESTAMP(NANOS) handling)
    graft.Tables.events(spark, sfDir).createOrReplaceTempView("events")
  }
}
