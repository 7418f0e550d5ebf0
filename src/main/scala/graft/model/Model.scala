package graft.model

import org.apache.spark.sql.types._

/** Core data model of the engine (see SURVEY.md §1.4).
  *
  * The reference (tylergneill/panditya) keeps a `Dict[str, Entity]` of
  * polymorphic Work/Author objects (`data_models.py:4-105`) plus a nested
  * e-text-link dict (`utils/load.py:23-32`). We model the same information
  * relationally:
  *
  *   - `entities`: one row per entity, `type` discriminator, nullable
  *     per-subtype columns, adjacency arrays as a denormalized view.
  *   - `edges`: the primary relationship table `(src, dst, etype)` with
  *     `etype ∈ {wrote, commentary_on}`; `wrote` points author→work,
  *     `commentary_on` points base-text→commentary (`grapher.py:58,62,66,75`).
  *   - `etextLinks`: flat `(workId, collection, subtype, link)` rows; the
  *     reference's heterogeneous nested JSON (`utils/transform.py:242-244`)
  *     is re-created only at the serialization boundary.
  */
object Schemas {

  val entitySchema: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("type", StringType, nullable = false), // "work" | "author"
    StructField("name", StringType),
    StructField("aka", StringType),
    StructField("socialIdentifiers", StringType),      // authors only
    StructField("discipline", StringType),             // works only
    StructField("disciplines", StringType),            // authors only, display agg
    StructField("highestYear", IntegerType),
    StructField("lowestYear", IntegerType),
    StructField("authorHighestYear", IntegerType),     // works only (imputed)
    StructField("authorLowestYear", IntegerType),      // works only (imputed)
    StructField("authorIds", ArrayType(StringType)),   // works only
    StructField("workIds", ArrayType(StringType)),     // authors only
    StructField("baseTextIds", ArrayType(StringType)), // works only
    StructField("commentaryIds", ArrayType(StringType)) // works only
  ))

  val edgeSchema: StructType = StructType(Seq(
    StructField("src", StringType, nullable = false),
    StructField("dst", StringType, nullable = false),
    StructField("etype", StringType, nullable = false)
  ))

  val etextLinkSchema: StructType = StructType(Seq(
    StructField("workId", StringType, nullable = false),
    StructField("collection", StringType, nullable = false),
    StructField("subtype", StringType, nullable = false),
    StructField("link", StringType, nullable = false)
  ))

  /** Edge type constants. */
  val Wrote = "wrote"
  val CommentaryOn = "commentary_on"
}

/** Typed views for the Dataset API. */
case class Edge(src: String, dst: String, etype: String)
case class EtextLink(workId: String, collection: String, subtype: String, link: String)

/** Typed accessors: `Dataset[T]` views over the unified entities table for
  * compile-time field checks in library code (`DataFrame` stays the
  * dynamic-schema surface). */
object Typed {
  import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
  import org.apache.spark.sql.functions.col

  def works(entities: DataFrame): Dataset[WorkEntity] =
    entities.filter(col("type") === "work")
      .select("id", "name", "aka", "discipline", "highestYear", "lowestYear",
        "authorHighestYear", "authorLowestYear", "authorIds", "baseTextIds",
        "commentaryIds")
      .as(Encoders.product[WorkEntity])

  def authors(entities: DataFrame): Dataset[AuthorEntity] =
    entities.filter(col("type") === "author")
      .select("id", "name", "aka", "socialIdentifiers", "disciplines",
        "highestYear", "lowestYear", "workIds")
      .as(Encoders.product[AuthorEntity])

  def edges(df: DataFrame): Dataset[Edge] =
    df.select("src", "dst", "etype").as(Encoders.product[Edge])

  def etextLinks(df: DataFrame): Dataset[EtextLink] =
    df.select("workId", "collection", "subtype", "link")
      .as(Encoders.product[EtextLink])
}

sealed trait EntityLike {
  def id: String
  def name: Option[String]
}
case class WorkEntity(
    id: String,
    name: Option[String],
    aka: Option[String],
    discipline: Option[String],
    highestYear: Option[Int],
    lowestYear: Option[Int],
    authorHighestYear: Option[Int],
    authorLowestYear: Option[Int],
    authorIds: Seq[String],
    baseTextIds: Seq[String],
    commentaryIds: Seq[String]) extends EntityLike
case class AuthorEntity(
    id: String,
    name: Option[String],
    aka: Option[String],
    socialIdentifiers: Option[String],
    disciplines: Option[String],
    highestYear: Option[Int],
    lowestYear: Option[Int],
    workIds: Seq[String]) extends EntityLike
