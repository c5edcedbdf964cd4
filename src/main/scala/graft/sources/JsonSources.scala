package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Nested-JSON source normalization (SURVEY §2.1 S2/S3/S5).
  *
  * The reference's REST payloads arrive as nested JSON and are
  * immediately flattened to flat columns
  * (`App/mdc/__init__.py:14-118,198-204`: plant model
  * enterprises→businessUnits→sites→areas→lines→units with ancestor
  * names kept; SharePoint lists as `fields.*` dicts,
  * `App/rco_main.py:121-188`). The Spark-first equivalent is
  * `spark.read.json` + an `explode` chain that carries ancestor
  * attributes down, and a `fields.*` struct select + prefix strip.
  */
object JsonSources {

  /** S2: flatten the 4-level plant model, one row per unit, keeping
    * every ancestor's name — the `json_normalize(..., meta=[...])`
    * analogue. Input schema:
    * enterprises: array<struct<name, sites: array<struct<name,
    * lines: array<struct<name, units: array<struct<name, unitType>>>>>>>. */
  def flattenPlantModel(raw: DataFrame): DataFrame =
    raw
      .select(explode(col("enterprises")).as("e"))
      .select(col("e.name").as("enterprise"),
        explode(col("e.sites")).as("s"))
      .select(col("enterprise"), col("s.name").as("site"),
        explode(col("s.lines")).as("l"))
      .select(col("enterprise"), col("site"), col("l.name").as("line"),
        explode(col("l.units")).as("u"))
      .select(col("enterprise"), col("site"), col("line"),
        col("u.name").as("unit"), col("u.unitType").as("unit_type"))

  /** S5: SharePoint-style list items — each row a struct of `fields` —
    * flattened to `fields.*` columns with the prefix stripped and a
    * select/rename map applied (P1-style). */
  def configList(raw: DataFrame, renames: Map[String, String])
      : DataFrame = {
    val flat = raw.select(col("fields.*"))
    ConfigOps.renameIfPresent(flat, renames)
  }
}
