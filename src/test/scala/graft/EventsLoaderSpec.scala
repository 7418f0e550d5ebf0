package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The events testdata has shipped with two different `ts` encodings across
  * driver regenerations (TIMESTAMP(NANOS) → int64-nanos under the legacy
  * reader flag; later plain TIMESTAMP_NTZ micros). The loader must branch on
  * the read schema so the NEXT regeneration can't break 20+ queries again:
  * all three plausible shapes must normalize to the same session-TZ
  * microsecond timestamps.
  */
class EventsLoaderSpec extends SparkTestBase {

  // 1700000123456016/-080 are planted regressions for the nanos branch:
  // their ns encodings (≈1.7e18, ulp 256 as double) round across a µs
  // boundary under double division, so `(ts / 1000L).cast("long")` yields
  // an off-by-one µs — only integral `ts div 1000` maps them back exactly.
  private val micros = // sorted: compared against outMicros' sorted output
    Seq(0L, 1700000000000000L, 1700000123456016L, 1700000123456080L, 1700000123456789L)

  private def outMicros(df: DataFrame): Seq[Long] =
    Queries.normalizeEventsTs(df)
      .select(unix_micros(col("ts")).as("us"))
      .collect().map(_.getLong(0)).toSeq.sorted

  test("normalizeEventsTs: int64-nanos, timestamp_ntz, timestamp all agree") {
    import spark.implicits._
    val asNanos = micros.map(_ * 1000L).toDF("ts")
    val asNtz = micros.toDF("us")
      .select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
    val asTz = micros.toDF("us")
      .select(timestamp_micros(col("us")).as("ts"))
    assert(outMicros(asNanos) === micros)
    assert(outMicros(asNtz) === micros)
    assert(outMicros(asTz) === micros)
  }

  test("normalizeEventsTs: survives a parquet round-trip of each writable shape") {
    import spark.implicits._
    val shapes = Seq(
      "nanos_long" -> micros.map(_ * 1000L).toDF("ts"),
      "ntz" -> micros.toDF("us")
        .select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts")),
      "tz" -> micros.toDF("us").select(timestamp_micros(col("us")).as("ts")))
    shapes.foreach { case (name, df) =>
      val dir = java.nio.file.Files.createTempDirectory(s"events_shape_$name")
      df.write.mode("overwrite").parquet(dir.toString)
      val back = spark.read.parquet(dir.toString)
      assert(outMicros(back) === micros, s"shape $name diverged after round-trip")
    }
  }

  test("events() reads the current testdata and yields a plain timestamp") {
    val df = Queries.events(spark, s"$testData/sf0.001")
    assert(df.schema("ts").dataType === TimestampType)
    assert(df.select(col("ts")).filter(col("ts").isNotNull).count() > 0)
  }
}
