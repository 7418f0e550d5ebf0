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
    // Collision-resistant MV identity: a 32-bit String.hashCode key (the
    // round-7 shape) admits two source dirs silently sharing one MV path +
    // table name — the staleness guard only checks the REQUESTED dir's
    // inputs, so a collision would serve one dir's pair relation to the
    // other. Key on a SHA-256 digest of the ABSOLUTE NORMALIZED path
    // instead (also collapses "./sf0.1" vs "sf0.1" to one MV).
    val absDir = java.nio.file.Paths.get(dir).toAbsolutePath.normalize.toString
    val key = dirDigest(absDir)
    val tbl = "graft_copurchase_" + key
    // Deterministic on-disk location per source dir: the MV files survive
    // JVM restarts (a fresh-JVM bench/probe run must NOT pay the lineitem
    // self-join again — exactly like a production MV next to the fact
    // table). The _SUCCESS marker gates reuse; a partial/killed write
    // rebuilds. The session-local memo only skips repeated FS checks.
    val path = copurchaseMemo.computeIfAbsent(absDir, _ => {
      val p = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
        "graft-copurchase-" + key, "pairs")
      // staleness guard: a regenerated source dir (same path, newer files)
      // must not serve the old MV — rebuild when ANY file under
      // lineitem.parquet (a single file or a directory of part files;
      // in-place part rewrites keep the DIRECTORY entry's mtime, so the
      // walk looks at the files themselves) is newer than the MV's
      // completion marker
      val marker = p.resolve("_SUCCESS")
      val fresh = java.nio.file.Files.exists(marker) && {
        val src = java.nio.file.Paths.get(absDir, "lineitem.parquet")
        try java.nio.file.Files.getLastModifiedTime(marker)
          .toMillis >= maxMtime(src)
        catch { case _: java.io.IOException => false }
      }
      if (!fresh) {
        val li = spark.read.parquet(s"$absDir/lineitem.parquet")
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

  /** Drops the session-lifetime FS-check memo, forcing the next
    * [[copurchase]] call to re-run the on-disk staleness walk — the
    * fresh-JVM condition, reproducible in-process for the spec. */
  private[graft] def resetCopurchaseMemoForTest(): Unit = copurchaseMemo.clear()

  /** First 16 hex chars of SHA-256 over the path bytes — 64 collision-
    * resistant bits (vs String.hashCode's 32), valid in a table identifier. */
  private[graft] def dirDigest(absDir: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(absDir.getBytes("UTF-8"))
      .take(8).map(b => f"${b & 0xff}%02x").mkString

  /** Newest last-modified time (millis) under `p`: the file itself, or for a
    * directory the max over contained files — so an in-place part rewrite
    * that preserves filenames still bumps the staleness clock. */
  private[graft] def maxMtime(p: java.nio.file.Path): Long = {
    import scala.jdk.CollectionConverters._
    if (java.nio.file.Files.isDirectory(p)) {
      val s = java.nio.file.Files.walk(p)
      try s.iterator.asScala
        .filter(java.nio.file.Files.isRegularFile(_))
        .map(java.nio.file.Files.getLastModifiedTime(_).toMillis)
        .foldLeft(java.nio.file.Files.getLastModifiedTime(p).toMillis)(math.max)
      finally s.close()
    } else java.nio.file.Files.getLastModifiedTime(p).toMillis
  }
}
