// Plan capture: writes `.explain("formatted")` output for selected queries
// to <outDir>/<query>_<tag>.txt, under the SAME session config as Bench
// (master local[$SPARK_GRAFT_CPUS], shuffle.partitions=$SPARK_GRAFT_CPUS) so
// the captured plan is the one the bench actually runs.
// Run: sbt 'runMain graft.tools.ExplainTo <sfDir> <outDir> <tag> <query...>'
package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

object ExplainTo {
  def main(args: Array[String]): Unit = {
    val Array(dir, outDir, tag, names @ _*) = args: @unchecked
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, dir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      Files.writeString(Paths.get(s"$outDir/${n}_$tag.txt"), plan)
      println(s"wrote $outDir/${n}_$tag.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
