package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/**
 * Loaders for the driver-provided test tables (see TESTDATA.md).
 *
 * All loaders are plain parquet scans — Catalyst gets the raw file
 * relation so filter pushdown / column pruning / partition coalescing
 * work unimpeded. The only special case is `events`, whose parquet
 * column `ts` is INT64 TIMESTAMP(NANOS): Spark rejects nanosecond
 * timestamps unless `spark.sql.legacy.parquet.nanosAsLong=true`, in
 * which case the column arrives as BIGINT nanoseconds. We convert to
 * microsecond TimestampType by integer floor-division, which matches
 * DuckDB's truncating TIMESTAMP_NS → TIMESTAMP read of the same file.
 */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val raw = spark.read.parquet(s"$dir/$name.parquet")
    // The driver testdata's timestamps are isAdjustedToUTC=false micros;
    // our sessions read them as TimestampType via
    // spark.sql.parquet.inferTimestampNTZ.enabled=false. Under a foreign
    // session that leaves the default, they'd arrive TIMESTAMP_NTZ and
    // break tz-dependent expressions (unix_micros etc.) — normalize
    // defensively. The cast is a no-op (schema check) in our sessions,
    // so scan pushdown is unaffected there.
    val ntz = raw.schema.fields.filter(_.dataType ==
      org.apache.spark.sql.types.TimestampNTZType)
    if (ntz.isEmpty) raw
    else ntz.foldLeft(raw)((df, f) =>
      df.withColumn(f.name, col(f.name).cast(org.apache.spark.sql.types.TimestampType)))
  }

  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** `events` with `ts` normalized to microsecond TimestampType. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = load(spark, dir, "events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else raw
  }
}
