package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.parquet carries INT64 TIMESTAMP(NANOS); read as ns-longs
      // (graft.Tables.events converts to microsecond timestamps, matching
      // DuckDB's truncating read of the same file).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // regenerated driver testdata carries isAdjustedToUTC=false micro
      // timestamps; read them as TimestampType (not NTZ) like before
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      // write timestamps as INT64 micros, not INT96, for oracle compare
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Local-iteration filter (unset for driver runs): comma-separated
    // query names; only those are dumped.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    // The driver's DuckDB oracle reads the regenerated testdata's
    // isAdjustedToUTC=false timestamps as NAIVE, so every oracle result
    // is tz-naive; a TimestampType (tz-aware) column in our dump would
    // fail the compare on tz-awareness, not values. Normalize ALL
    // timestamp outputs to NTZ at this single choke point (UTC session:
    // same wall-clock, same instant; already-NTZ columns via Det.ntz
    // are untouched).
    def ntzAll(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      df.schema.fields
        .filter(_.dataType == org.apache.spark.sql.types.TimestampType)
        .foldLeft(df)((d, f) => d.withColumn(f.name,
          org.apache.spark.sql.functions.col(f.name)
            .cast(org.apache.spark.sql.types.TimestampNTZType)))
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
        try ntzAll(fn(spark, sfDir)).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
      }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
