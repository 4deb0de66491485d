package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.norm.Normalize

/** Institutional catalog integration (reference
  * `integrate_ups_catalog_and_label_affiliations`, PIPE:401-442;
  * SURVEY.md J6/J7/S4).
  */
object Catalog {

  val sedesSchema: StructType = StructType(Seq(
    StructField("SedeID", IntegerType),
    StructField("Sede", StringType),
    StructField("AreaAcademica", StringType),
    StructField("PalabrasClave", StringType)))

  /** Seeded dimension rows (PIPE:222-227). */
  def seededSedes(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      (1, "Sede Cuenca", "Ciencias de la Vida", "cuenca;azuay"),
      (2, "Sede Quito", "Ingenierías y Arquitectura", "quito;pichincha"),
      (3, "Sede Guayaquil", "Ciencias Sociales y Humanas", "guayaquil;guayas"),
      (4, "Otra", "No definida", ""),
    ).toDF("sedeId", "sede", "areaAcademica", "palabrasClave")
  }

  /** S4 — catalog CSV scan with declared schema. */
  def readCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").schema(sedesSchema).csv(path)
      .select(col("SedeID").as("sedeId"), col("Sede").as("sede"),
        col("AreaAcademica").as("areaAcademica"),
        coalesce(col("PalabrasClave"), lit("")).as("palabrasClave"))

  /** J6 — UPSERT as one full-outer coalesce merge: incoming rows update
    * matching sedeId, new ids insert, unmatched existing rows survive
    * (replaces UPDATE-join + NOT-EXISTS insert, PIPE:417-428).
    */
  def upsertSedes(existing: DataFrame, incoming: DataFrame): DataFrame = {
    val e = existing.select(col("sedeId"), col("sede").as("e_sede"),
      col("areaAcademica").as("e_area"), col("palabrasClave").as("e_kw"))
    val i = incoming.select(col("sedeId"), col("sede").as("i_sede"),
      col("areaAcademica").as("i_area"), col("palabrasClave").as("i_kw"))
    e.join(i, Seq("sedeId"), "full_outer")
      .select(col("sedeId"),
        coalesce(col("i_sede"), col("e_sede")).as("sede"),
        coalesce(col("i_area"), col("e_area")).as("areaAcademica"),
        coalesce(col("i_kw"), col("e_kw")).as("palabrasClave"))
  }

  /** J7 — keyword theta-join relabeling: each catalog keyword claims
    * affiliations containing it as a substring. The reference applies
    * UPDATEs in CSV row order so the last match wins (PIPE:433-441);
    * batch semantics fix that deterministically as max_by(sedeId, rowIdx)
    * over the exploded keyword list. Keyword side is tiny → broadcast
    * nested-loop join; affiliation side streams through unshuffled.
    * Unmatched affiliations keep their classified sedeId, defaulting to 4.
    */
  def labelAffiliations(afiliaciones: DataFrame, sedes: DataFrame): DataFrame = {
    val kws = sedes
      .select(col("sedeId").as("kwSedeId"),
        posexplode_outer(Normalize.keywordSplit(col("palabrasClave")))
          .as(Seq("kwPos", "kw")))
      .filter(col("kw").isNotNull)
      // CSV row order ≈ sedeId order here; priority = (sedeId, kwPos).
      .withColumn("kwPriority",
        col("kwSedeId") * 1000 + col("kwPos"))
    val matched = afiliaciones.alias("a")
      .join(broadcast(kws),
        col("a.afiliacionBusqueda").contains(col("kw")), "left")
      .groupBy(col("a.afiliacionId").as("afiliacionId"))
      .agg(max_by(col("kwSedeId"), col("kwPriority")).as("kwSede"))
    // Precedence: keyword match > ingest-time classification (C9) > the
    // reference's blanket SedeID=4 backfill (PIPE:433).
    afiliaciones.join(matched, Seq("afiliacionId"), "left")
      .withColumn("sedeId",
        coalesce(col("kwSede"), col("sedeId"), lit(4)))
      .drop("kwSede")
  }
}
