package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Corpus sampling for training-data mixes: per-stratum downsampling
 * (rebalance languages/sources) and deterministic per-key top-k.
 *
 * Two flavors with different determinism contracts:
 *  - [[downsampleByKey]] wraps Bernoulli `sampleBy` — statistically
 *    uniform, seed-stable for a fixed partitioning, the right tool for
 *    "keep ~10% of language X".
 *  - [[deterministicPerKey]] keeps exactly `k` rows per key chosen by
 *    hash order — fully reproducible across cluster layouts (the hash
 *    depends only on row ids), the right tool for eval-set carve-outs
 *    that must never drift between runs.
 *
 * Both are one narrow pass plus (for per-key) one window shuffle.
 */
object Sampling {

  /** Bernoulli stratified downsample: `fractions(key) → keep-rate`;
    * keys absent from the map are kept entirely. */
  def downsampleByKey(df: DataFrame, keyCol: String,
                      fractions: Map[String, Double], seed: Long): DataFrame = {
    val allKeys = df.select(col(keyCol)).distinct()
      .collect().map(_.get(0).toString)
    val full = allKeys.map(k => k -> fractions.getOrElse(k, 1.0)).toMap
    df.stat.sampleBy(keyCol, full, seed)
  }

  /** Exactly `k` rows per key, selected by xxhash64(id) order —
    * deterministic for a given id column regardless of partitioning. */
  def deterministicPerKey(df: DataFrame, keyCol: String, idCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(xxhash64(col(idCol)), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }
}
