package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.norm.Normalize

/** Cleanup pass + denormalized analytics view (reference
  * `pandas_cleanup_and_flatview`, PIPE:445-533; SURVEY.md §3.3).
  * One linear DataFrame chain — Catalyst prunes/pushes through it; the
  * rollup is a single hash aggregation per grain.
  */
object FlatView {

  /** §3.3 step 1 — re-normalize projections (C1/C3/C14) + key dedup (A5).
    * The reference re-cleans with pandas clones of the same functions
    * (PIPE:446-457,472-488); here cleanup is the same Column exprs.
    */
  def cleanObras(obras: DataFrame): DataFrame =
    obras
      .withColumn("doi", Normalize.standardizeDoi(col("doi")))
      .withColumn("titulo", Normalize.normNfc(col("titulo")))
      .withColumn("revista", Normalize.normNfc(col("revista")))
      .withColumn("editorial", Normalize.normNfc(col("editorial")))
      .withColumn("anio", col("anio").cast("int"))
      .withColumn("citas", col("citas").cast("int"))
      .withColumn("referencias", col("referencias").cast("int"))
      .filter(length(col("doi")) > 0)
      .dropDuplicates("doi")

  /** F7 — referential-integrity semi-join filters (PIPE:491-495). */
  def enforceRi(oaa: DataFrame, obras: DataFrame, autores: DataFrame,
      afiliaciones: DataFrame): DataFrame =
    oaa
      .join(obras.select("doi"), Seq("doi"), "left_semi")
      .join(autores.select("autorId"), Seq("autorId"), "left_semi")
      .join(afiliaciones.select("afiliacionId"), Seq("afiliacionId"),
        "left_semi")
      .dropDuplicates("doi", "autorId", "afiliacionId")

  private def joined(c: org.apache.spark.sql.Column) =
    concat_ws("; ", array_sort(collect_set(c)))

  /** J1-J5 + A1-A4 — the flat view. One row per work; multi-valued
    * attributes collapsed to "; "-joined sorted distinct strings
    * (PIPE:505-531). Sede dimension is broadcast (4 rows).
    */
  def vistaAnalisis(obras: DataFrame, autores: DataFrame,
      afiliaciones: DataFrame, oaa: DataFrame, obraTema: DataFrame,
      sedes: DataFrame): DataFrame = {
    val flat = oaa
      .join(autores.select("autorId", "nombreLimpio"), Seq("autorId"), "left")
      .join(afiliaciones.select("afiliacionId", "cadenaLiteral", "sedeId",
        "countryCode", "countryName", "esUps"), Seq("afiliacionId"), "left")
      .join(broadcast(sedes.select("sedeId", "sede", "areaAcademica")),
        Seq("sedeId"), "left")

    val rollup = flat.groupBy("doi").agg(
      joined(col("nombreLimpio")).as("autores"),
      joined(col("cadenaLiteral")).as("afiliaciones"),
      joined(col("sede")).as("sedes"),
      joined(col("areaAcademica")).as("areas"),
      joined(col("countryName")).as("paises"),
      joined(col("countryCode")).as("paisesCodigo"),
      coalesce(max(col("esUps")), lit(false)).as("upsFlag"))

    val temasAgg = obraTema.groupBy("doi")
      .agg(joined(col("tema")).as("temas"))

    obras
      .join(rollup, Seq("doi"), "left")
      .join(temasAgg, Seq("doi"), "left")
      .select(col("doi"), col("titulo"), col("anio"), col("revista"),
        col("editorial"), col("tipo"), col("citas"), col("referencias"),
        col("fechaPublicacion"),
        coalesce(col("autores"), lit("")).as("autores"),
        coalesce(col("afiliaciones"), lit("")).as("afiliaciones"),
        coalesce(col("sedes"), lit("")).as("sedes"),
        coalesce(col("areas"), lit("")).as("areas"),
        coalesce(col("paises"), lit("")).as("paises"),
        coalesce(col("paisesCodigo"), lit("")).as("paisesCodigo"),
        coalesce(col("upsFlag"), lit(false)).as("upsFlag"),
        // same empty-string convention as the five sibling multi-value
        // columns above — a lone null temas would make the exported
        // view's contract column-dependent
        coalesce(col("temas"), lit("")).as("temas"))
  }
}
