// Measures the partition-pruned CDC apply against the full-table merge
// on the SAME single-batch change set — the table/delta ratio experiment
// behind SCALING.md's streaming-CDC row. Run:
//   SPARK_GRAFT_SF_DIR=/tmp/graft_sf1 sbt 'runMain graft.tools.CdcPrunedBench'
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

object CdcPrunedBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val buckets = 16
    // maintained table: one row per order key, bucket-partitioned
    val table = graft.Tables.orders(spark, sfDir)
      .select((col("o_orderkey") % buckets).cast(IntegerType).as("kb"),
        col("o_orderkey").as("k"), col("o_totalprice").as("v"))
    // the delta: bucket 0 only — upsert half its keys, delete every 8th
    val delta = table.filter(col("kb") === 0)
    val ups = delta.filter(col("k") % 2 === 0)
      .select(col("kb"), col("k"), (col("v") * 2).as("v"))
    val dels = delta.filter(col("k") % 8 === 4).select("kb", "k")
    def timed(tag: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val snap = body
      println(f"[cdc-pruned-bench] $tag%-12s ${(System.nanoTime() - t0) / 1e9}%.2f s (snapshot $snap)")
    }
    // both stores seeded identically (seeding untimed)
    val base = s"/tmp/graft_cdcpb_${new java.io.File(sfDir).getName}"
    org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(base), true)
    val st = new graft.engine.SnapshotStore(spark, s"$base/store")
    st.overwrite(table, "serve", "pruned", Seq("kb"))
    st.overwrite(table, "serve", "full", Seq("kb"))
    // two rounds: round 1 pays JVM/codegen warm-up, round 2 is the
    // steady-state comparison (each round's apply is a real commit —
    // the second upsert re-touches the same keys, same volumes)
    for (round <- 1 to 2) {
      timed(s"pruned#$round") {
        st.cdcApplyPartitions(ups, dels, "serve", "pruned",
          keys = Seq("kb", "k"), partitionBy = Seq("kb"))
      }
      timed(s"full-table#$round") {
        val existing = st.read("serve", "full")
        val kept = existing.join(dels, Seq("kb", "k"), "left_anti")
        st.overwrite(graft.engine.Merge.upsert(kept, ups, Seq("kb", "k")),
          "serve", "full", Seq("kb"))
      }
    }
    // the structural number wall-clock hides at local sizes: bytes and
    // files REWRITTEN per apply (pruned carries untouched partitions
    // by manifest reference; full-table rewrites everything)
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    def bytesOf(files: Set[String]): Long = files.toSeq.map { f =>
      fs.getFileStatus(new org.apache.hadoop.fs.Path(f)).getLen
    }.sum
    Seq("pruned", "full").foreach { t =>
      val snaps = st.snapshots("serve", t)
      val prev = st.readSnapshot("serve", t, snaps(snaps.length - 2)).inputFiles.toSet
      val curr = st.readSnapshot("serve", t, snaps.last).inputFiles.toSet
      val rewritten = curr.diff(prev)
      println(f"[cdc-pruned-bench] $t%-7s last apply rewrote ${rewritten.size}%3d files, " +
        f"${bytesOf(rewritten) / 1048576.0}%.1f MiB of ${bytesOf(curr) / 1048576.0}%.1f MiB table")
    }
    // correctness cross-check: both end states identical
    val a = st.read("serve", "pruned").orderBy("k").collect()
    val b = st.read("serve", "full").orderBy("k").collect()
    require(a.sameElements(b), "pruned and full-table apply diverged")
    println(s"[cdc-pruned-bench] end states identical (${a.length} rows)")
    spark.stop()
  }
}
