package graft

import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** Opt-in scale-profiling harness for the graph-ANN family (set
  * GRAFT_PROF=1 and have tools/ScaleUp's sf1 at /tmp/graft_sf1) —
  * the per-phase attribution that caught the r14 entry-fraction
  * defect (search was 19 of 21 s/batch). Skipped in normal runs. */
class NNProfSpec extends SparkSpec {
  test("profile stream_nn phases at sf1") {
    val dir = "/tmp/graft_sf1"
    assume(sys.env.contains("GRAFT_PROF") && new java.io.File(dir).isDirectory)
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      info(f"$label: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val b0 = emb.filter(col("vec_id") % 8 =!= 0 && col("vec_id") % 8 =!= 4)
    val g0 = t("build") {
      Similarity.nnDescent(b0, "vec_id", "embedding", k = 6, rounds = 2,
        buckets = math.max(16L, b0.count() / 128).toInt).localCheckpoint()
    }
    info(s"g0 rows=${g0.count()}")
    val batchA = emb.filter(col("vec_id") % 8 === 0)
    val eA = b0.unionByName(batchA)
    val searched = t("search A") {
      Similarity.graphSearch(eA, "vec_id", "embedding",
        g0.select(col("vec_id").as("src"), col("nbr_id").as("dst")),
        batchA.select("vec_id"), beam = 8, hops = 3, k = 6, entries = 32)
        .localCheckpoint()
    }
    info(s"searched rows=${searched.count()}")
    val g1 = t("insert A (incl. search again)") {
      Similarity.nnDescentInsert(eA, "vec_id", "embedding", g0,
        batchA.select("vec_id"), k = 6, beam = 8, hops = 3, entries = 32)
        .localCheckpoint()
    }
    info(s"g1 rows=${g1.count()}")
    val batchB = emb.filter(col("vec_id") % 8 === 4)
    val eB = eA.unionByName(batchB)
    val g2 = t("insert B") {
      Similarity.nnDescentInsert(eB, "vec_id", "embedding", g1,
        batchB.select("vec_id"), k = 6, beam = 8, hops = 3, entries = 32)
        .localCheckpoint()
    }
    info(s"g2 rows=${g2.count()}")
  }
}
