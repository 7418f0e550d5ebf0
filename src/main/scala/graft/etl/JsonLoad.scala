package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON sources (SURVEY §2.1 S4/S5): the reference's two serve-time inputs,
  * `entities.json` (`utils/load.py:14-21`) and `etext-link-data.json`
  * (`utils/load.py:23-32`), read as *distributed* Spark scans.
  *
  * Both files are id-keyed maps, so naive `spark.read.json` would infer one
  * column per entity (~17k columns). Instead the file is read `wholetext` and
  * parsed with `from_json` against an explicit `MapType` schema, then
  * `explode`d to rows — schema-first, no driver-side JSON parsing, and the
  * (tiny) parse fans out to a full DataFrame immediately.
  *
  * The link file's collection values are a *union* type — bare link list, or
  * subtype→links map (`utils/transform.py:242-244`). Spark schemas are
  * homogeneous, so the value is first captured as a raw JSON string
  * (`from_json` to `StringType` keeps the unparsed subtree) and then decoded
  * twice: `ArrayType` for the collapsed shape, `MapType` otherwise. A bare
  * list means the original subtype label was dropped at serialization, so
  * those rows carry `subtype = null`.
  */
object JsonLoad {

  val entityStruct: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("type", StringType),
    StructField("name", StringType),
    StructField("aka", StringType),
    StructField("social_identifiers", StringType),
    StructField("discipline", StringType),
    StructField("disciplines", StringType),
    StructField("highest_year", IntegerType),
    StructField("lowest_year", IntegerType),
    StructField("author_highest_year", IntegerType),
    StructField("author_lowest_year", IntegerType),
    StructField("author_ids", ArrayType(StringType)),
    StructField("work_ids", ArrayType(StringType)),
    StructField("base_text_ids", ArrayType(StringType)),
    StructField("commentary_ids", ArrayType(StringType))))

  /** `{id: entity}` JSON → the unified entities DataFrame (camelCase columns,
    * same shape as [[EntityBuilder]] output). */
  def entities(spark: SparkSession, path: String): DataFrame = {
    spark.read.option("wholetext", "true").text(path)
      .select(explode(from_json(col("value"),
        MapType(StringType, entityStruct))).as(Seq("key", "e")))
      .select(
        col("e.id"), col("e.type"), col("e.name"), col("e.aka"),
        col("e.social_identifiers").as("socialIdentifiers"),
        col("e.discipline"), col("e.disciplines"),
        col("e.highest_year").as("highestYear"),
        col("e.lowest_year").as("lowestYear"),
        col("e.author_highest_year").as("authorHighestYear"),
        col("e.author_lowest_year").as("authorLowestYear"),
        col("e.author_ids").as("authorIds"),
        col("e.work_ids").as("workIds"),
        col("e.base_text_ids").as("baseTextIds"),
        col("e.commentary_ids").as("commentaryIds"))
  }

  private val linkTopSchema: StructType = StructType(Seq(
    StructField("work_id_to_link_mapping",
      MapType(StringType, MapType(StringType, StringType))),
    StructField("collection_total_link_counts", MapType(StringType, LongType)),
    StructField("collection_missing_work_id_counts", MapType(StringType, LongType))))

  private def top(spark: SparkSession, path: String): DataFrame =
    spark.read.option("wholetext", "true").text(path)
      .select(from_json(col("value"), linkTopSchema).as("top"))

  /** Link JSON → flat `(workId, collection, subtype, link)`; `subtype` is
    * null where the source had the single-subtype collapsed (bare-list)
    * shape. */
  def etextLinks(spark: SparkSession, path: String): DataFrame = {
    val pairs = top(spark, path)
      .select(explode(col("top.work_id_to_link_mapping")).as(Seq("workId", "colls")))
      .select(col("workId"), explode(col("colls")).as(Seq("collection", "payload")))
    val asArr = from_json(col("payload"), ArrayType(StringType))
    val asMap = from_json(col("payload"), MapType(StringType, ArrayType(StringType)))
    val fromArr = pairs.filter(asArr.isNotNull)
      .select(col("workId"), col("collection"),
        lit(null).cast("string").as("subtype"), explode(asArr).as("link"))
    val fromMap = pairs.filter(asArr.isNull)
      .select(col("workId"), col("collection"),
        explode(asMap).as(Seq("subtype", "links")))
      .select(col("workId"), col("collection"), col("subtype"),
        explode(col("links")).as("link"))
    fromArr.unionByName(fromMap)
  }

  /** [[etextLinks]] with list positions: `(workId, collection, subtype,
    * link, idx, total)` — idx is the link's 0-based position within its
    * (work, collection, subtype) list and total that list's size, the two
    * values the presentation layer's label extractors receive
    * (`static/js/graph.js:330-338`; the UTA Google-Doc enumeration needs
    * them). posexplode preserves the JSON array order. */
  def etextLinksIndexed(spark: SparkSession, path: String): DataFrame = {
    val pairs = top(spark, path)
      .select(explode(col("top.work_id_to_link_mapping")).as(Seq("workId", "colls")))
      .select(col("workId"), explode(col("colls")).as(Seq("collection", "payload")))
    val asArr = from_json(col("payload"), ArrayType(StringType))
    val asMap = from_json(col("payload"), MapType(StringType, ArrayType(StringType)))
    val fromArr = pairs.filter(asArr.isNotNull)
      .select(col("workId"), col("collection"),
        lit(null).cast("string").as("subtype"), size(asArr).as("total"),
        posexplode(asArr).as(Seq("idx", "link")))
    val fromMap = pairs.filter(asArr.isNull)
      .select(col("workId"), col("collection"),
        explode(asMap).as(Seq("subtype", "links")))
      .select(col("workId"), col("collection"), col("subtype"),
        size(col("links")).as("total"),
        posexplode(col("links")).as(Seq("idx", "link")))
    fromArr.unionByName(fromMap)
      .select(col("workId"), col("collection"), col("subtype"),
        col("link"), col("idx"), col("total"))
  }

  /** Count side-tables → `(collection, etexts, etexts_missing_works)` —
    * the same shape as [[LinkBuilder.Built.collectionCounts]]. */
  def collectionCounts(spark: SparkSession, path: String): DataFrame = {
    val t = top(spark, path)
    val totals = t.select(explode(col("top.collection_total_link_counts"))
      .as(Seq("collection", "etexts")))
    val missing = t.select(explode(col("top.collection_missing_work_id_counts"))
      .as(Seq("collection", "etexts_missing_works")))
    totals.join(missing, Seq("collection"), "full_outer")
      .na.fill(0L, Seq("etexts", "etexts_missing_works"))
  }
}
