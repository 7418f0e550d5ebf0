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
}
