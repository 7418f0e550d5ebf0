package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expr.Iast
import graft.graph.Subgraph

/** Entity-facing queries (`flask_app.py:60-146`). */
object EntityQueries {

  /** Dropdown label: `"{name} ({id})"` + optional ` [{dates}]` + ` [{aka}]`
    * (`flask_app.py:60-68`). Pure column expressions. */
  def labelCol: Column = {
    val base = concat(col("name"), lit(" ("), col("id"), lit(")"))
    val dates = Subgraph.dateInfo
    val withDates = when(dates =!= "", concat(base, lit(" ["), dates, lit("]")))
      .otherwise(base)
    when(col("aka").isNotNull && col("aka") =!= "",
      concat(withDates, lit(" ["), col("aka"), lit("]")))
      .otherwise(withDates)
  }

  /** Sorted dropdown options for 'works' | 'authors' | 'all'
    * (`flask_app.py:60-73,95-106`) — IAST-collated via the custom expression;
    * ArrayType(Int) sort keys order natively in Spark's sort so the plan is a
    * normal global sort, no driver-side comparator.
    */
  def dropdownOptions(entities: DataFrame, which: String): DataFrame = {
    val base = which match {
      case "all" => entities
      case "works" => entities.filter(col("type") === "work")
      case "authors" => entities.filter(col("type") === "author")
    }
    Iast.register(entities.sparkSession)
    base.select(col("id"), labelCol.as("label"))
      .orderBy(Iast.iastKey(col("label")))
  }

  /** Point lookups `ids → {id, label}` (`flask_app.py:121-146`).
    * Error contract parity: empty/invalid-chars input and all-invalid ids are
    * client errors; a MIX of valid+unknown ids is a server error in the
    * reference (unhandled KeyError → 500) — we surface the same distinction.
    */
  sealed trait LabelsResult
  case class LabelsOk(df: DataFrame) extends LabelsResult
  case class LabelsBadRequest(msg: String) extends LabelsResult     // → 400
  case class LabelsServerError(msg: String) extends LabelsResult    // → 500

  def labels(entities: DataFrame, idsParam: String): LabelsResult = {
    val stripped = Option(idsParam).map(_.trim).getOrElse("")
    if (stripped.isEmpty)
      return LabelsBadRequest("ids must be a non-empty comma-separated list")
    if (!stripped.matches("[\\d,]*"))
      return LabelsBadRequest("ids must contain only digits and commas")
    val ids = stripped.split(",").filter(_.nonEmpty).toSeq
    if (ids.isEmpty)
      return LabelsBadRequest("ids must be a non-empty comma-separated list")
    val requested = ids.distinct
    val found = entities.filter(col("id").isin(requested: _*))
      .select(col("id"), labelCol.as("label"))
    val nFound = found.count()
    if (nFound == 0) LabelsBadRequest("no valid ids")
    else if (nFound < requested.size)
      LabelsServerError(s"unknown ids among: ${requested.mkString(",")}")
    else LabelsOk(found)
  }
}
