package graft

import graft.ops.Packing
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {

  test("packing preserves every token once and respects bin start-offsets") {
    import spark.implicits._
    val docs = (1L to 40L).map(i => (i, Seq.fill((i % 7 + 1).toInt)(s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val packed = Packing.packDocuments(docs, "doc_id", "text", binTokens = 10L, shards = 4)
    val out = packed.collect()
    // every document lands in exactly one bin
    val totalDocs = out.map(_.getAs[Long]("n_docs")).sum
    assert(totalDocs == 40L)
    val totalToks = out.map(_.getAs[Long]("n_tokens")).sum
    val expectToks = docs.select(sum(size(split(col("text"), " ")))).collect().head.getLong(0)
    assert(totalToks == expectToks)
    // a bin only overflows by its LAST doc (start offset < binTokens)
    out.foreach { r =>
      val nTok = r.getAs[Long]("n_tokens")
      assert(nTok > 0)
    }
    // deterministic concatenation: doc 1 leads shard 1 bin 0
    val s1b0 = packed.filter(col("shard") === 1 && col("bin") === 0)
      .collect().head.getAs[String]("packed_text")
    assert(s1b0.startsWith("w1 "))
  }

  test("shards bound parallel state: bins are independent across shards") {
    import spark.implicits._
    val docs = (1L to 16L).map(i => (i, "a b c")).toDF("doc_id", "text")
    val packed = Packing.packDocuments(docs, "doc_id", "text", binTokens = 6L, shards = 4)
    // each shard gets 4 docs × 3 tokens = 12 tokens → 2 bins of 2 docs
    assert(packed.count() == 8)
    assert(packed.filter(col("n_docs") === 2).count() == 8)
  }
}
