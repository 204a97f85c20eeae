package graft.tools

import graft.queries.MedallionPipeline
import org.apache.spark.sql.SparkSession

/** Stage-attributed steady-state timing of the medallion pipeline:
  * `PipeTime <sfDir> [iters]` runs [[MedallionPipeline.runTimed]] N
  * times and prints per-stage walls — the profiling harness behind the
  * m_incremental_pipeline bench target (a regression shows up as a
  * stage, not a blob). */
object PipeTime {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val iters = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    (1 to iters).foreach { it =>
      val t0 = System.nanoTime()
      val (gold, stages) = MedallionPipeline.runTimed(spark, dir,
        s"/tmp/graft_wh_pipetime")
      gold.write.format("noop").mode("overwrite").save()
      val total = (System.nanoTime() - t0) / 1e9
      println(f"iter $it total: $total%.2f s  " +
        stages.map { case (n, s) => f"$n=$s%.2f" }.mkString(" "))
    }
    spark.stop()
  }
}
