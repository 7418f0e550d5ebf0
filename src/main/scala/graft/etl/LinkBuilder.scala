package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SETI master CSV → flat e-text link rows + collection count side-tables.
  *
  * Reference: `utils/transform.py:176-270`. The reference builds a nested
  * `work_id → collection → subtype → sorted links` dict with a single-subtype
  * collapse at serialization; we keep the flat relation
  * `(workId, collection, subtype, link)` as the primary representation
  * (SURVEY §1.1) and re-nest only in the JSON boundary (`serve.JsonOut`).
  *
  * Faithfully reproduced:
  *  - rows with null/empty `Work ID` skipped (`transform.py:213-214`);
  *  - per-row link presence counts (a row with ≥1 link counts once toward
  *    `collection_total_link_counts`; `Work ID == "..."` also counts toward
  *    the missing table — `transform.py:216-221`);
  *  - `Work ID` split on `[,\r\n]+` with trim (`transform.py:223`);
  *  - subtype labels: per-collection tuple indexed by link position; for the
  *    two collections whose "tuple" is actually a bare string the reference's
  *    `mapped_labels[index]` indexes CHARACTERS ('web HTML'[0] == 'w') — we
  *    replicate that quirk exactly (`transform.py:194-204,225-231`); unknown
  *    collections fall back to ('main','underlying','extract');
  *  - set-dedup + lexicographic sort of links per (work, collection, subtype)
  *    (`transform.py:234,239-240`).
  */
object LinkBuilder {

  val linkCols: Seq[(String, String)] = Seq(
    "main" -> "Link 1 (main)",
    "underlying" -> "Link 2 (underlying)",
    "extract" -> "Link 3 (extract)")

  /** `collection_subtype_labels` — values kept as Any to reproduce the
    * reference's bare-string entries (`transform.py:194-204`). */
  private val subtypeLabels: Map[String, IndexedSeq[String]] = {
    def chars(s: String): IndexedSeq[String] = s.map(_.toString)
    Map(
      "DCS" -> IndexedSeq("web HTML", "GitHub (1) CoNLL-U", "GitHub (2) TXT"),
      "GRETIL" -> chars("web HTML"),           // bare string in the reference
      "Muktabodha KSTS" -> chars("web HTML"),  // bare string in the reference
      "SARIT" -> IndexedSeq("web HTML", "GitHub XML"),
      "Sanskrit Library and TITUS" -> IndexedSeq("Skt Lib web HTML", "TITUS web HTML"),
      "Vātāyana and Pramāṇa NLP" -> IndexedSeq("Vātāyana web HTML", "Pramāṇa NLP GitHub"),
      "UTA Dharmaśāstra" -> IndexedSeq("web HTML", "Google Doc"),
      "DiPAL DCV" -> IndexedSeq("web HTML work page", "web HTML text"),
      "HANSEL" -> IndexedSeq("GitHub TXT", "GitHub XML", "web HTML"))
  }
  val collectionKeys: Seq[String] = Seq(
    "DCS", "GRETIL", "Muktabodha KSTS", "SARIT", "Sanskrit Library and TITUS",
    "Vātāyana and Pramāṇa NLP", "UTA Dharmaśāstra", "DiPAL DCV", "HANSEL")

  /** Subtype for (collection, link position) — built into a literal map
    * expression at plan time; no per-row Scala closure. */
  def subtypeFor(collection: String, idx: Int): String =
    subtypeLabels.get(collection) match {
      case Some(labels) => labels(idx)
      case None => linkCols(idx)._1
    }

  case class Built(links: DataFrame, collectionCounts: DataFrame)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("multiLine", "true")
      .option("escape", "\"").csv(path)

  def build(spark: SparkSession, csvPath: String): Built =
    buildFromRows(read(spark, csvPath))

  def buildFromRows(raw: DataFrame): Built = {
    val spark = raw.sparkSession
    import spark.implicits._

    val withId = raw.filter($"Work ID".isNotNull && $"Work ID" =!= "")

    // --- per-collection count side-tables (row-level, before the explode) ---
    val anyLink = linkCols.map { case (_, c) => col(c).isNotNull }.reduce(_ || _)
    val counted = withId.groupBy($"Collection".as("collection")).agg(
      sum(when(anyLink, 1).otherwise(0)).cast("long").as("etexts"),
      sum(when(anyLink && $"Work ID" === "...", 1).otherwise(0)).cast("long")
        .as("etexts_missing_works"))
    // All known collections appear with 0s even if absent from the data
    // (`dict.fromkeys(collection_keys, 0)`, transform.py:207-208).
    val zeroes = collectionKeys.toDF("collection")
    val collectionCounts = zeroes.join(counted, Seq("collection"), "left")
      .na.fill(0L, Seq("etexts", "etexts_missing_works"))

    // --- explode work ids × link columns → flat subtype-labeled rows --------
    // The subtype of a link depends on (collection, position): encode the
    // static mapping as a chain of literal whens, evaluated by codegen.
    // Collections whose label tuple is shorter than the link position are
    // skipped: the reference would raise IndexError if such a row existed
    // (it never does in the data), so no label mapping is defined for them.
    def subtypeExpr(idx: Int): Column =
      subtypeLabels.collect { case (coll, labels) if labels.size > idx => coll }
        .toSeq.sorted
        .foldLeft(lit(linkCols(idx)._1)) { (acc, coll) =>
          when($"collection" === coll, lit(subtypeFor(coll, idx))).otherwise(acc)
        }

    val perLink = linkCols.zipWithIndex.map { case ((_, colName), idx) =>
      withId
        .filter(col(colName).isNotNull && trim(col(colName)) =!= "")
        .select(
          $"Collection".as("collection"),
          explode(filter(
            transform(split($"Work ID", "[,\\r\\n]+"), x => trim(x)),
            x => x =!= "")).as("workId"),
          trim(col(colName)).as("link"))
        .withColumn("subtype", subtypeExpr(idx))
    }.reduce(_ unionByName _)

    // set-dedup per (workId, collection, subtype): distinct flat rows
    val links = perLink.select($"workId", $"collection", $"subtype", $"link").distinct()
    Built(links, collectionCounts)
  }
}
