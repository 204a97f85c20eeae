package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Sequence packing: concatenate short documents into ~`binTokens`-token
 * training sequences — the pretraining step that turns a deduped,
 * filtered corpus into dense context windows.
 *
 * Greedy packing is inherently sequential, so the distributed form
 * shards first: documents land in `shards` deterministic shards
 * (`doc_id % shards`), a running token total WITHIN each shard assigns
 * the bin (`floor(start_offset / binTokens)`), and each (shard, bin)
 * concatenates its docs in id order. Parallelism = `shards` regardless
 * of corpus size; the cost is slight bin underfill at shard boundaries
 * (bounded by one document per shard tail). A single global window
 * would pack perfectly but serializes the cumsum — the classic
 * exactness-vs-parallelism trade, resolved here the scale-safe way.
 */
object Packing {

  def packDocuments(docs: DataFrame, idCol: String, textCol: String,
                    binTokens: Long, shards: Int): DataFrame = {
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    docs
      .select(col(idCol), col(textCol),
        TextOps.tokenCount(col(textCol)).as("n_tok"),
        (col(idCol) % shards).as("shard"))
      .withColumn("start_off", sum(col("n_tok")).over(w) - col("n_tok"))
      .withColumn("bin", floor(col("start_off") / binTokens))
      .groupBy(col("shard"), col("bin"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        // id-ordered concatenation via sorted (id, text) structs
        array_join(expr(s"transform(array_sort(collect_list(struct($idCol, $textCol))), x -> x.$textCol)"),
          " ").as("packed_text"))
  }
}
