package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expr.IastSortKey

/** Session-extension entry point: wires the library's custom Catalyst
  * expressions into any session via configuration —
  * `--conf spark.sql.extensions=graft.GraftExtensions` — so SQL users get
  * them without touching library code:
  * `SELECT * FROM entities ORDER BY iast_sort_key(label)`.
  *
  * (The imperative alternative, [[graft.expr.Iast.register]], injects into an
  * already-built session; this is the declarative seam for clusters where the
  * session is constructed by infra.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("iast_sort_key"),
      new ExpressionInfo(classOf[IastSortKey].getName, "iast_sort_key"),
      (children: Seq[Expression]) => IastSortKey(children.head)))
  }
}
