// Stage-level attribution for one query: per-stage task count, run time,
// deserialize time, GC, shuffle bytes — run 3× (steady state = run 3).
// Run: sbt 'runMain graft.tools.StageProf <sfDir> <query>'
package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import scala.collection.mutable

object StageProf {
  def main(args: Array[String]): Unit = {
    val Array(dir, name) = args.take(2)
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
    case class St(name: String, tasks: Int, runMs: Long, deserMs: Long,
                  gcMs: Long, cpuMs: Long, srBytes: Long, swBytes: Long, wallMs: Long)
    val stages = mutable.Buffer.empty[St]
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        val wall = (for { a <- si.completionTime; b <- si.submissionTime } yield a - b).getOrElse(-1L)
        stages.synchronized {
          stages += St(si.name.takeWhile(_ != '\n').take(60), si.numTasks,
            m.executorRunTime, m.executorDeserializeTime, m.jvmGCTime,
            m.executorCpuTime / 1000000, m.shuffleReadMetrics.totalBytesRead,
            m.shuffleWriteMetrics.bytesWritten, wall)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    (1 to 3).foreach { it =>
      stages.synchronized(stages.clear())
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(400)
      println(f"== $name run$it wall=$wall%.2fs stages=${stages.size}")
      if (it == 3) {
        val top = stages.synchronized(stages.sortBy(-_.runMs).take(25))
        top.foreach { s =>
          println(f"  run=${s.runMs}%5d cpu=${s.cpuMs}%5d deser=${s.deserMs}%4d gc=${s.gcMs}%4d " +
            f"tasks=${s.tasks}%3d wall=${s.wallMs}%5d sr=${s.srBytes}%8d sw=${s.swBytes}%8d  ${s.name}")
        }
        val totRun = stages.map(_.runMs).sum; val totCpu = stages.map(_.cpuMs).sum
        val totDeser = stages.map(_.deserMs).sum; val totGc = stages.map(_.gcMs).sum
        println(f"  TOTAL run=${totRun}ms cpu=${totCpu}ms deser=${totDeser}ms gc=${totGc}ms stages=${stages.size}")
      }
    }
    spark.stop()
  }
}
