package graft

import graft.engine.SnapshotStore
import org.apache.hadoop.fs.Path

/** Safety at the edge of the single-writer contract: if a foreign
  * manifest appears at the id the store would commit next (what losing
  * a race to a concurrent winner looks like on disk), the late commit
  * must fail LOUDLY — never silently clobber or silently build on
  * garbage — and the existing manifest's bytes must survive. */
class ConcurrentCommitSpec extends SparkSpec {
  import spark.implicits._

  test("a commit arriving after a foreign manifest fails loudly and clobbers nothing") {
    val root = java.nio.file.Files.createTempDirectory("graft_cas").toString
    val st = new SnapshotStore(spark, root)
    st.overwrite(Seq((1L, "a")).toDF("id", "v"), "silver", "t")
    val winner = new Path(s"$root/silver/t/_manifests/m${"%012d".format(2L)}")
    val fs = winner.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(winner, false)
    out.write("WINNER".getBytes("UTF-8")); out.close()
    // the late writer must observe the foreign manifest and fail — it
    // tries to BUILD ON it (append reads the latest manifest), and a
    // manifest it cannot parse is a loud stop, not a silent overwrite
    intercept[Exception] {
      st.append(Seq((2L, "b")).toDF("id", "v"), "silver", "t")
    }
    val in = fs.open(winner)
    val content = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    assert(content == "WINNER", "late commit clobbered the existing manifest")
    // and the committed snapshot 1 is still perfectly readable
    assert(st.readSnapshot("silver", "t", 1L).count() == 1)
  }
}
