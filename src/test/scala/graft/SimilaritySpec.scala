package graft

import graft.ops.Similarity
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  private def vecs = {
    import spark.implicits._
    Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.0f, 1.0f, 0.0f)),
      (2L, Array(2.0f, 0.0f, 0.0f)),   // parallel to 0
      (3L, Array(1.0f, 1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
  }

  test("cosine: identical=1, orthogonal=0, scale-invariant") {
    val out = vecs.as("a").crossJoin(vecs.as("b"))
      .select(col("a.vec_id"), col("b.vec_id"),
        Similarity.cosine(col("a.embedding"), col("b.embedding")).as("c"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(math.abs(out((0L, 0L)) - 1.0) < 1e-12)
    assert(math.abs(out((0L, 1L))) < 1e-12)
    assert(math.abs(out((0L, 2L)) - 1.0) < 1e-12)
    assert(math.abs(out((0L, 3L)) - math.sqrt(0.5)) < 1e-12)
  }

  test("bruteForceTopK ranks by cosine with id tiebreak") {
    val out = Similarity.bruteForceTopK(vecs, "embedding", "vec_id",
      Array(1.0, 0.0, 0.0), k = 3)
      .collect().map(_.getLong(0))
    assert(out.toSeq == Seq(0L, 2L, 3L)) // cos 1.0, 1.0 (tiebreak id), 0.707
  }

  test("ivfAssign picks the nearest centroid, ties by centroid id") {
    import spark.implicits._
    val cents = Seq((10L, Array(1.0f, 0.0f, 0.0f)), (11L, Array(0.0f, 1.0f, 0.0f)))
      .toDF("c_id", "c_vec")
    val out = Similarity.ivfAssign(vecs, "embedding", "vec_id", cents, "c_vec", "c_id")
      .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((0L, 10L), (1L, 11L), (2L, 10L), (3L, 10L))) // 3 ties → lower c_id
  }

  test("identical vectors land in the same LSH bucket; near-dup pairs found") {
    import spark.implicits._
    val planes = Similarity.hyperplanes(8, 3)
    val dup = vecs.unionByName(
      Seq((100L, Array(1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding"))
    val pairs = Similarity.embeddingNearDupPairs(dup, "embedding", "vec_id", planes, 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 100L)))  // identical vector pair survives
    assert(pairs.contains((0L, 2L)))    // parallel vector pair too
    assert(!pairs.exists(p => p._1 == 1L || p._2 == 1L)) // orthogonal: no pair
  }

  test("hyperplanes are deterministic for a fixed seed") {
    val a = Similarity.hyperplanes(4, 8)
    val b = Similarity.hyperplanes(4, 8)
    assert(a.flatten.toSeq == b.flatten.toSeq)
  }
}
