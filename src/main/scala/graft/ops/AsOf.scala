package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join by composition — no built-in Spark operator, and no
  * range cross-join needed: tag both inputs, union, and carry the latest
  * right payload forward with one `last(ignoreNulls)` window pass.
  *
  * Cost: one shuffle of (|L|+|R|) rows on the key + a per-key sort — the
  * same plan shape at any scale, vs the O(|L|·|R|) per-key blow-up of the
  * naive range-join formulation. (Preference order per the build rules:
  * composition beats a custom SparkPlan when semantics allow, which they do
  * here.)
  */
object AsOf {

  /** For each left row, attach the most recent right row with
    * `right.ts <= left.ts` and equal `key` (backward as-of, inclusive —
    * DuckDB/pandas `asof` semantics). Right payload columns (everything but
    * key/ts) come back prefixed `asof_`, null when no prior right row.
    * Ties on (key, ts): right rows order deterministically by their payload
    * struct; a right row at exactly left.ts wins over earlier rows.
    */
  def joinBackward(left: DataFrame, right: DataFrame, key: String, ts: String): DataFrame = {
    val payCols = right.columns.filter(c => c != key && c != ts)
    val pay = struct(payCols.map(c => col(c).as(s"asof_$c")): _*)
    val r2 = right.select(col(key).as("__k"), col(ts).as("__t"),
      lit(0).as("__tag"), pay.as("__pay"))
    val lrow = struct(left.columns.map(col): _*)
    val l2 = left.select(col(key).as("__k"), col(ts).as("__t"),
      lit(1).as("__tag"), lrow.as("__lrow"))
    val u = r2.withColumn("__lrow", lit(null).cast(l2.schema("__lrow").dataType))
      .unionByName(l2.withColumn("__pay", lit(null).cast(r2.schema("__pay").dataType)))
    // right rows (tag 0) sort before left rows at the same ts → inclusive;
    // __pay as the final key makes duplicate-(key, ts) rights deterministic
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__tag"), col("__pay"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("__last", last(col("__pay"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(col("__lrow.*") +: payCols.map(c =>
        col(s"__last.asof_$c").as(s"asof_$c")): _*)
  }
}
