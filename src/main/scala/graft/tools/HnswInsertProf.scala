package graft.tools

import graft.ops.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolates the r16 `weak` fix in [[Similarity.hnswInsert]]: time a
  * FIXED-SIZE batch insert against a growing corpus, with the entry
  * pools derived (a) the legacy way — `hnswLevelExpr` re-projected over
  * ALL of emb and localCheckpointed per call — and (b) from a staged
  * leveled-membership table ([[Similarity.hnswLevels]], materialized
  * once like any once-per-ingest artifact). The batch is constant, so
  * any (a)−(b) gap that GROWS with the corpus is exactly the
  * corpus-scan term the maintained table removes; the remaining common
  * cost is the beam search against the (necessarily corpus-sized)
  * layer graphs. Usage: `HnswInsertProf <dir> [batchSize]`. */
object HnswInsertProf {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val batchN = if (args.length > 1) args(1).toInt else 128
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val n = emb.count()
    // deterministic fixed-size batch: the batchN largest ids
    val cut = emb.select(col("vec_id")).orderBy(col("vec_id").desc)
      .limit(batchN).agg(min("vec_id")).head.getLong(0)
    val base = emb.filter(col("vec_id") < cut).localCheckpoint()
    val delta = emb.filter(col("vec_id") >= cut).select("vec_id").localCheckpoint()
    val g0 = Similarity.hnswBuild(base, "vec_id", "embedding",
      k = 6, rounds = 2, maxLevel = 2,
      bucketsFor = m => math.max(16L, m / 128).toInt).localCheckpoint()
    val staged = Similarity.hnswLevels(base, "vec_id", maxLevel = 2)
      .localCheckpoint() // the once-per-ingest artifact, built untimed
    def once(levels: Option[org.apache.spark.sql.DataFrame]): Double = {
      val t0 = System.nanoTime()
      Similarity.hnswInsert(emb, "vec_id", "embedding", g0, delta,
          k = 6, beam = 8, hops = 3, maxLevel = 2, levels = levels)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    once(None); once(Some(staged)) // warm both plans
    // INTERLEAVED samples: the shared host drifts between JVM-seconds,
    // so alternating the two variants keeps the comparison paired
    val pairs = (1 to 4).map(_ => (once(None), once(Some(staged))))
    def fmt(xs: Seq[Double]) = f"min=${xs.min}%.2f runs=${xs.map(t => f"$t%.2f").mkString(",")}"
    println(s"legacy-corpus-projection corpus=$n batch=$batchN ${fmt(pairs.map(_._1))}")
    println(s"staged-levels            corpus=$n batch=$batchN ${fmt(pairs.map(_._2))}")
    spark.stop()
  }
}
