package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for all suites (Spark startup dominates
  * test wall-clock otherwise). UTC + small shuffle fan-out to mirror
  * the driver harness config. */
object SparkSpec {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft_wh").toString)
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    // the driver testdata's events.ts is INT64 TIMESTAMP(NANOS) — same
    // config the Bench/Verify mains run with (Tables.events normalizes)
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // regenerated driver testdata carries isAdjustedToUTC=false micro
    // timestamps; read them as TimestampType (not NTZ) like before
    .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    .getOrCreate()
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.spark
}
