package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The actual inventory lives in [[graft.Queries]]; the panditya-parity
  * library is under graft.etl / graft.graph / graft.query / graft.ops.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * 2-hop BFS over the part↔supplier graph — the reference's core operator
    * shape (graph traversal by iterative joins) on the testdata tables. */
  def entry(spark: SparkSession): DataFrame =
    Queries.queries("q31_bfs_2hop")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables — every query carries one (approximate and
    * iterative operators are replayed exactly: md5-derived hashes, unrolled
    * fixed-round CTEs, integerized arithmetic). */
  def oracleSql: Map[String, String] = Queries.oracleSql
}
