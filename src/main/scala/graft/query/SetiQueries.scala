package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SETI e-text set-algebra queries (`flask_app.py:261-464`) over the flat
  * `etextLinks(workId, collection, subtype, link)` relation.
  */
object SetiQueries {

  /** Per-collection summary (`utils/utils.py:53-81`): etexts (rows with ≥1
    * link), etexts_missing_works ("..." rows), coverage truncated (not
    * rounded!) to 0.1%, distinct works; ordered by works desc.
    * Collections with zero matched works are absent (reference iterates
    * `works_per_collection`).
    */
  def summary(links: DataFrame, collectionCounts: DataFrame): DataFrame = {
    val works = links.filter(col("workId") =!= "...")
      .groupBy(col("collection"))
      .agg(countDistinct(col("workId")).as("works"))
    works.join(collectionCounts, Seq("collection"))
      .withColumn("etext_coverage",
        floor((col("etexts") - col("etexts_missing_works"))
          / col("etexts") * 1000).cast("double") / 10)
      .select(col("collection"), col("etexts"), col("etexts_missing_works"),
        col("etext_coverage"), col("works"))
      .orderBy(col("works").desc)
  }

  /** Works of a collection (T4, `flask_app.py:261-293`).
    * @param includeOther if true, keep ALL collections' rows for matched
    *        works; else only the requested collection's rows.
    * Sentinel "..." works dropped (`flask_app.py:290-291`).
    */
  def byCollection(links: DataFrame, collection: String, includeOther: Boolean): DataFrame = {
    val matched = links
      .filter(col("collection") === collection && col("workId") =!= "...")
      .select(col("workId")).distinct()
    val base = if (includeOther) links else links.filter(col("collection") === collection)
    base.join(matched, Seq("workId"), "left_semi")
  }

  /** Works exclusive to a collection (T3, `flask_app.py:331-361`): the work's
    * link map contains exactly this one collection. */
  def uniqueToCollection(links: DataFrame, collection: String): DataFrame = {
    val only = links.filter(col("workId") =!= "...")
      .groupBy(col("workId"))
      .agg(countDistinct(col("collection")).as("nColl"),
        max(col("collection")).as("anyColl"))
      .filter(col("nColl") === 1 && col("anyColl") === collection)
      .select(col("workId"))
    links.join(only, Seq("workId"), "left_semi")
  }

  /** 3-way overlap partition (T2, `flask_app.py:364-416`): works in both /
    * only c1 / only c2, with a `bucket` column ∈ {overlap, only_c1, only_c2}.
    */
  def overlap(links: DataFrame, c1: String, c2: String): DataFrame = {
    val membership = links.filter(col("workId") =!= "...")
      .filter(col("collection").isin(c1, c2))
      .groupBy(col("workId"))
      .agg(
        max(when(col("collection") === c1, 1).otherwise(0)).as("in1"),
        max(when(col("collection") === c2, 1).otherwise(0)).as("in2"))
    membership.withColumn("bucket",
      when(col("in1") === 1 && col("in2") === 1, "overlap")
        .when(col("in1") === 1, "only_c1")
        .otherwise("only_c2"))
      .select(col("workId"), col("bucket"))
  }

  /** Link payloads for explicit work ids (`flask_app.py:419-454`). */
  def byWork(links: DataFrame, ids: Seq[String]): DataFrame =
    links.filter(col("workId").isin(ids: _*))

  /** Authors for a set of works (J8, `flask_app.py:457-464`): semi-join +
    * explode + distinct over the works' author lists. */
  def authorsOfWorks(entities: DataFrame, workIds: DataFrame): DataFrame = {
    entities.filter(col("type") === "work")
      .join(workIds, Seq("id"), "left_semi")
      .select(explode(col("authorIds")).as("authorId"))
      .distinct()
  }
}
