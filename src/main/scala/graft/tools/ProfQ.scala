// Job-level wall-clock attribution for one or more queries: runs each
// named query under the Bench session config and reports, per run, the
// job count, total task time, and per-job durations — so "where does the
// wall go" (scheduling/barrier count vs compute) is a measurement, not a
// guess (optimization guide §1).
// Run: sbt 'runMain graft.tools.ProfQ <sfDir> <query...>'
package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import scala.collection.mutable

object ProfQ {
  def main(args: Array[String]): Unit = {
    val dir = args.head
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
    @volatile var jobs = mutable.Buffer.empty[(Int, Long)] // (jobId, wallMs)
    @volatile var taskMs = 0L
    @volatile var nTasks = 0L
    val starts = mutable.Map.empty[Int, Long]
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts.synchronized { starts(j.jobId) = j.time }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        starts.synchronized {
          starts.remove(j.jobId).foreach(t0 => jobs += ((j.jobId, j.time - t0)))
        }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        if (t.taskMetrics != null) taskMs += t.taskMetrics.executorRunTime
        nTasks += 1
      }
    }
    spark.sparkContext.addSparkListener(listener)
    args.tail.foreach { name =>
      (1 to 3).foreach { it =>
        jobs = mutable.Buffer.empty; taskMs = 0L; nTasks = 0L
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300) // let the listener bus drain
        val jobWall = jobs.map(_._2).sum / 1e3
        println(f"$name run$it: wall=$wall%.2fs jobs=${jobs.size} " +
          f"jobWall=$jobWall%.2fs taskTime=${taskMs / 1e3}%.2fs tasks=$nTasks " +
          f"gap=${wall - jobWall}%.2fs")
        if (it == 3) {
          val top = jobs.sortBy(-_._2).take(12)
            .map { case (id, ms) => f"j$id=${ms / 1e3}%.2f" }.mkString(" ")
          println(s"  slowest jobs: $top")
        }
      }
    }
    spark.stop()
  }
}
