package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.FreshCheckpoint

import graft.model.Schemas

/** Cleaned-entities CSV → `entities` + `edges` DataFrames.
  *
  * Re-expresses the reference's row-at-a-time fold (`utils/transform.py:21-173`)
  * as declarative DataFrame ops. The reference's semantics are order-dependent
  * (later CSV rows overwrite names set by earlier rows; adjacency lists keep
  * first-mention order), so we carry an explicit `rowIdx` ordering column and
  * encode "last/first writer wins" as `max_by`/`min_by` over `(rowIdx, pos)` —
  * a commutative aggregation that stays correct under any partitioning, unlike
  * the reference's sequential dict mutation.
  *
  * Row semantics reproduced exactly:
  *  - multi-value cells split on "," + trim + drop empties (`transform.py:51-52`)
  *  - author/base lists zipped id↔name truncating to the shorter list
  *    (`zip` semantics, `transform.py:87,106`)
  *  - years parsed as a pair only when Highest Year is non-empty
  *    (`transform.py:65`)
  *  - entity type fixed at first creation (work row | person row | mention)
  *  - name: last assignment wins across own rows and mentions
  *    (`transform.py:77,97,116,132`)
  *  - authors without works dropped (`transform.py:142-144`)
  *  - per-author `disciplines` display string sorted by (-count, name)
  *    (`transform.py:146-156`)
  *  - undated works imputed from first listed dated author (`transform.py:158-165`)
  */
object EntityBuilder {

  /** Split a multi-value cell: split on ",", trim items, drop empties. */
  private def splitField(c: org.apache.spark.sql.Column) =
    filter(transform(split(coalesce(c, lit("")), ","), x => trim(x)), x => x =!= "")

  /** Zip two string arrays truncating to the shorter (Python `zip`). */
  private def zipMin(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    slice(arrays_zip(a.as("x"), b.as("y")), lit(1), least(size(a), size(b)))

  case class Built(entities: DataFrame, edges: DataFrame)

  def readCleanedCsv(spark: SparkSession, path: String): DataFrame = {
    // coalesce(1) keeps file order so monotonically_increasing_id is the CSV
    // row number — the ordering key the reference's merge semantics need.
    // (Reference-parity ETL is inherently order-defined; the input is ~19k
    // rows. At scale the ordering key would come from the source itself.)
    spark.read
      .option("header", "true")
      .option("multiLine", "true")
      .option("escape", "\"")
      .csv(path)
      .coalesce(1)
      .withColumn("rowIdx", monotonically_increasing_id())
  }

  def build(spark: SparkSession, csvPath: String): Built =
    buildFromRows(normalize(readCleanedCsv(spark, csvPath)))

  /** Project raw CSV columns to normalized names/types. */
  def normalize(raw: DataFrame): DataFrame = {
    raw.select(
      lower(trim(coalesce(col("Content type"), lit("")))).as("ctype"),
      trim(col("ID")).as("id"),
      trim(coalesce(col("Name"), lit(""))).as("name"),
      trim(coalesce(col("Aka"), lit(""))).as("aka"),
      trim(coalesce(col("Social identifiers"), lit(""))).as("social"),
      trim(coalesce(col("Discipline"), lit(""))).as("discipline"),
      trim(coalesce(col("Highest Year"), lit(""))).as("hy"),
      trim(coalesce(col("Lowest Year"), lit(""))).as("ly"),
      splitField(col("Authors (IDs)")).as("authorIds"),
      splitField(col("Authors (names)")).as("authorNames"),
      splitField(col("Base texts (IDs)")).as("baseIds"),
      splitField(col("Base texts (names)")).as("baseNames"),
      col("rowIdx"))
      .withColumn("hyInt", when(col("hy") =!= "", col("hy").cast("int")))
      .withColumn("lyInt", when(col("hy") =!= "", col("ly").cast("int")))
  }

  def buildFromRows(rows0: DataFrame): Built = {
    val spark = rows0.sparkSession
    import spark.implicits._

    val rows = rows0.localCheckpoint(true)
    val workRows = rows.filter($"ctype" === "work")
    val personRows = rows.filter($"ctype" === "person")

    // --- mentions -----------------------------------------------------------
    // (workId, rowIdx, pos, aid, aname): one row per author listed on a work row
    val authorship = workRows
      .select($"id".as("workId"), $"rowIdx",
        posexplode(zipMin($"authorIds", $"authorNames")).as(Seq("pos", "z")))
      .select($"workId", $"rowIdx", $"pos", trim($"z.x").as("aid"), trim($"z.y").as("aname"))
      .localCheckpoint(true)
    // (workId, rowIdx, pos, bid, bname): base texts listed on a work row
    val basetexts = workRows
      .select($"id".as("workId"), $"rowIdx",
        posexplode(zipMin($"baseIds", $"baseNames")).as(Seq("pos", "z")))
      .select($"workId", $"rowIdx", $"pos", trim($"z.x").as("bid"), trim($"z.y").as("bname"))
      .localCheckpoint(true)

    // --- entity type: fixed at first creation -------------------------------
    // Within a row, creation order is: the row's own entity, then its authors,
    // then its base texts (`transform.py:70-120`); encode as an in-row ordinal.
    val creations = workRows.select($"id", $"rowIdx", lit(0L).as("ord"), lit("work").as("t"))
      .union(personRows.select($"id", $"rowIdx", lit(0L).as("ord"), lit("author").as("t")))
      .union(authorship.select($"aid", $"rowIdx", ($"pos" + 1).cast("long"), lit("author")))
      .union(basetexts.select($"bid", $"rowIdx", ($"pos" + 100000).cast("long"), lit("work")))
    val entityType = creations.groupBy("id")
      .agg(min_by($"t", struct($"rowIdx", $"ord")).as("type"))

    // --- names: last assignment wins ---------------------------------------
    // Candidates: own work row (ord 0), own person row (ord 0), author mention
    // (A.name = aname), base-text mention (BT.name = bname).
    val nameCands = workRows.select($"id", $"rowIdx", lit(0L).as("ord"), $"name")
      .union(personRows.select($"id", $"rowIdx", lit(0L).as("ord"), $"name"))
      .union(authorship.select($"aid", $"rowIdx", ($"pos" + 1).cast("long"), $"aname"))
      .union(basetexts.select($"bid", $"rowIdx", ($"pos" + 100000).cast("long"), $"bname"))
    val finalName = nameCands.groupBy("id")
      .agg(max_by($"name", struct($"rowIdx", $"ord")).as("name"))

    // --- own-row scalar attributes (last own row wins) ----------------------
    val workOwn = workRows.groupBy("id").agg(
      max_by(struct($"aka", $"discipline", $"hyInt", $"lyInt"), $"rowIdx").as("w"))
      .select($"id", $"w.aka".as("aka"), $"w.discipline".as("discipline"),
        $"w.hyInt".as("highestYear"), $"w.lyInt".as("lowestYear"))
    val personOwn = personRows.groupBy("id").agg(
      max_by(struct($"aka", $"social", $"hyInt", $"lyInt"), $"rowIdx").as("p"))
      .select($"id", $"p.aka".as("aka"), $"p.social".as("socialIdentifiers"),
        $"p.hyInt".as("highestYear"), $"p.lyInt".as("lowestYear"))

    // --- ordered, first-occurrence-deduped adjacency lists ------------------
    def orderedList(pairs: DataFrame, key: String, item: String): DataFrame = {
      pairs.groupBy(col(key), col(item))
        .agg(min(struct($"rowIdx", $"pos")).as("k"))
        .groupBy(col(key))
        .agg(transform(
          array_sort(collect_list(struct($"k", col(item).as("v")))),
          s => s("v")).as(item + "s"))
    }
    val workAuthors = orderedList(authorship, "workId", "aid") // workId -> aids
    val authorWorks = orderedList(authorship, "aid", "workId") // aid -> workIds
    val workBases = orderedList(basetexts, "workId", "bid")    // workId -> bids
    val baseComms = orderedList(basetexts, "bid", "workId")    // bid -> commentaryIds

    // --- assemble works -----------------------------------------------------
    val allEntities = entityType.join(finalName, Seq("id"), "left")
    val works = allEntities.filter($"type" === "work")
      .join(workOwn, Seq("id"), "left")
      .join(workAuthors.withColumnRenamed("workId", "id"), Seq("id"), "left")
      .join(workBases.withColumnRenamed("workId", "id"), Seq("id"), "left")
      .join(baseComms.withColumnRenamed("bid", "id"), Seq("id"), "left")
      .withColumn("authorIds", coalesce($"aids", array()))
      .withColumn("baseTextIds", coalesce($"bids", array()))
      .withColumn("commentaryIds", coalesce($"workIds", array()))
      .drop("aids", "bids", "workIds")

    // --- assemble authors (drop workless: inner join on authorship) ---------
    val authors = allEntities.filter($"type" === "author")
      .join(personOwn, Seq("id"), "left")
      .join(authorWorks.withColumnRenamed("aid", "id"), Seq("id"), "inner")

    // --- per-author disciplines display string ------------------------------
    // Count each listed work once (workIds is distinct), only non-empty
    // disciplines; sort by (-count, discipline) codepoint order; render
    // "Nyāya (3), Yoga (1)" (`transform.py:146-156`).
    val workDisc = works.select($"id".as("workId"), $"discipline")
      .filter($"discipline".isNotNull && $"discipline" =!= "")
    val discCounts = authors.select($"id".as("aid"), explode($"workIds").as("workId"))
      .join(workDisc, "workId")
      .groupBy($"aid", $"discipline").agg(count(lit(1)).as("cnt"))
    val disciplines = discCounts
      .groupBy($"aid")
      .agg(array_join(
        transform(
          array_sort(collect_list(struct((-$"cnt").as("negCnt"), $"discipline".as("d")))),
          s => concat(s("d"), lit(" ("), (s("negCnt") * -1).cast("string"), lit(")"))),
        ", ").as("disciplines"))

    val authorsFull = authors
      .join(disciplines.withColumnRenamed("aid", "id"), Seq("id"), "left")

    // --- work-year imputation from first listed dated author ----------------
    val authorYears = authorsFull.select($"id".as("aid"),
      $"highestYear".as("ahy"), $"lowestYear".as("aly"))
    val imputed = works.filter($"highestYear".isNull)
      .select($"id", posexplode($"authorIds").as(Seq("pos", "aid")))
      .join(authorYears, "aid")
      .filter($"ahy".isNotNull)
      .groupBy($"id")
      .agg(min_by(struct($"ahy", $"aly"), $"pos").as("ay"))
      .select($"id", $"ay.ahy".as("authorHighestYear"), $"ay.aly".as("authorLowestYear"))

    val worksFull = works.join(imputed, Seq("id"), "left")

    // --- final unified entities table ---------------------------------------
    val entities = worksFull.select(
      $"id", $"type", $"name", $"aka",
      lit(null).cast("string").as("socialIdentifiers"),
      $"discipline", lit(null).cast("string").as("disciplines"),
      $"highestYear", $"lowestYear", $"authorHighestYear", $"authorLowestYear",
      $"authorIds", lit(null).cast("array<string>").as("workIds"),
      $"baseTextIds", $"commentaryIds")
      .unionByName(authorsFull.select(
        $"id", $"type", $"name", $"aka", $"socialIdentifiers",
        lit(null).cast("string").as("discipline"), $"disciplines",
        $"highestYear", $"lowestYear",
        lit(null).cast("int").as("authorHighestYear"),
        lit(null).cast("int").as("authorLowestYear"),
        lit(null).cast("array<string>").as("authorIds"), $"workIds",
        lit(null).cast("array<string>").as("baseTextIds"),
        lit(null).cast("array<string>").as("commentaryIds")))

    // --- edges --------------------------------------------------------------
    // wrote: author→work; commentary_on: base→commentary (`grapher.py:58-66,75`)
    val wrote = authorship.select($"aid".as("src"), $"workId".as("dst"))
      .distinct().withColumn("etype", lit(Schemas.Wrote))
    val commentaryOn = basetexts.select($"bid".as("src"), $"workId".as("dst"))
      .distinct().withColumn("etype", lit(Schemas.CommentaryOn))
    val edges = wrote.unionByName(commentaryOn)

    Built(entities, edges)
  }
}
