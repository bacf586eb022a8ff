package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * The reference discovers schema dynamically at runtime per source
  * (/root/reference/scripts/dbitool.pl:3048-3058); here parquet footers
  * carry the schema and Catalyst resolves it at analysis time.
  *
  * Spark's TimestampType is microsecond; parquet TIMESTAMP(NANOS)
  * columns (events.ts) are read via the nanosAsLong escape hatch and
  * converted — the test data is µs-precision (ns % 1000 == 0), so the
  * conversion is lossless and oracle-parity-safe.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Footer schema as the reader sees it BEFORE the ts conversion in
    * [[apply]] — ns-encoded events report ts as LongType here (the
    * nanosAsLong escape hatch), µs-encoded as TimestampType. Stream
    * sources need this raw type to declare their schema: peeking the
    * converted [[apply]] schema would always see TimestampType and
    * mis-declare the ns form (ADVICE r9).
    */
  def rawSchema(spark: SparkSession, dir: String, name: String) = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.read.parquet(s"$dir/$name.parquet").schema
  }

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Naive (isAdjustedToUTC=false) µs TIMESTAMP columns must load as
    // session-tz instants, not TIMESTAMP_NTZ: the operator library works
    // in instant arithmetic (unix_micros, watermarks), the session tz is
    // pinned UTC, and the DuckDB oracle is timezone-naive — so the wall
    // values agree either way, but NTZ would fail unix_micros outright.
    // (The driver's generated data switched ns -> µs encoding between
    // rounds; the LongType branch keeps the ns form loading too.)
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // NB: integer `div`, not `/` — epoch-nanos overflow double's 53-bit
    // mantissa, so float division silently loses microseconds.
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }
}
