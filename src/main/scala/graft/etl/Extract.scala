package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Extract stage: 163-column Pandit export → 14-column raw entities CSV
  * (`utils/extract.py:1-78`), plus the scripted manual-cleaning pass that the
  * reference documents as a human step (`data/manual_cleaning.md`) — scripted
  * here so the pipeline is reproducible end-to-end (SURVEY §3.2).
  */
object Extract {

  val columnsToKeep: Seq[String] = Seq(
    "Content type", "ID", "Title", "Aka", "Social identifiers",
    "Author (person IDs)", "Authors (person)",
    "Attributed author (person ID)", "Attributed author (person)",
    "Discipline", "Commentary on (work ID)", "Commentary on (work)",
    "Highest Year", "Lowest Year")

  /** `.str.strip("; ")` — strip any of {';', ' '} from both ends. */
  private def stripSemiSpace(c: Column): Column =
    regexp_replace(regexp_replace(c, "^[; ]+", ""), "[; ]+$", "")

  /** extract.py semantics over an export DataFrame (all-string columns):
    * project 14 cols → type filter → attributed-author coalesce → separator
    * cleanup → drop/rename → null→"".
    */
  def extract(export: DataFrame): DataFrame = {
    val projected = export.select(columnsToKeep.map(col): _*)
      .filter(col("Content type").isin("Work", "Person"))
    // Merge "Attributed author" into "Author" when blank (extract.py:49-52);
    // NaN→"" first so blank means empty-or-missing.
    val merged = projected
      .withColumn("Author (person IDs)",
        when(trim(coalesce(col("Author (person IDs)"), lit(""))) === "",
          col("Attributed author (person ID)"))
          .otherwise(coalesce(col("Author (person IDs)"), lit(""))))
      .withColumn("Authors (person)",
        when(trim(coalesce(col("Authors (person)"), lit(""))) === "",
          col("Attributed author (person)"))
          .otherwise(coalesce(col("Authors (person)"), lit(""))))
    // Collapse ";;" runs, strip leading/trailing "; " (extract.py:55-56).
    val cleaned = merged
      .withColumn("Author (person IDs)",
        stripSemiSpace(regexp_replace(col("Author (person IDs)"), ";\\s*;", ";")))
      .withColumn("Authors (person)",
        stripSemiSpace(regexp_replace(col("Authors (person)"), ";\\s*;", ";")))
      .drop("Attributed author (person ID)", "Attributed author (person)")
    val renamed = cleaned
      .withColumnRenamed("Title", "Name")
      .withColumnRenamed("Author (person IDs)", "Authors (IDs)")
      .withColumnRenamed("Authors (person)", "Authors (names)")
      .withColumnRenamed("Commentary on (work ID)", "Base texts (IDs)")
      .withColumnRenamed("Commentary on (work)", "Base texts (names)")
    renamed.na.fill("")
  }

  /** The manual cleaning recipe (`data/manual_cleaning.md`), scripted at the
    * raw-text-line level exactly as performed in the editor:
    *  1. delete `[^\w,\n'" \(\[-] ?` junk after each comma
    *  2. delete rows containing "dummy"
    *  3. delete 4 misclassified works (scholarship rows) by ID
    *  4. de-duplicate rows (keep first)
    * plus one additional edit present in the committed file but not listed in
    * the doc: work 92233's name had a "73.2 " prefix removed.
    * Verified to reproduce the committed cleaned CSV byte-for-byte (as a line
    * multiset) — see ExtractSpec.
    */
  def manualCleaning(spark: SparkSession, rawCsvPath: String): DataFrame = {
    import spark.implicits._
    val lines = spark.read.textFile(rawCsvPath).coalesce(1)
      .withColumn("rowIdx", monotonically_increasing_id())
    val header = lines.filter($"rowIdx" === 0)
    val badIds = Seq("94687", "94401", "89073", "91797")
    val cleanedRows = lines.filter($"rowIdx" > 0)
      // (?U): Java \w is ASCII-only by default; the reference's editor regex
      // was Unicode-aware (else "Śuddhādvaita" would lose its Ś)
      .withColumn("value", regexp_replace($"value", "(?U)(?<=,)[^\\w,\\n'\" \\(\\[-] ?", ""))
      .filter(!lower($"value").contains("dummy"))
      .filter(!split($"value", ",").getItem(1).isin(badIds: _*))
      .withColumn("value",
        when(split($"value", ",").getItem(1) === "92233",
          regexp_replace($"value", "73\\.2 Mānameyodaya", "Mānameyodaya"))
          .otherwise($"value"))
      .groupBy($"value").agg(min($"rowIdx").as("rowIdx"))
    header.select($"value", $"rowIdx")
      .unionByName(cleanedRows)
      .orderBy($"rowIdx")
      .select($"value")
  }
}
