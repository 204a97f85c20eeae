package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew mitigation primitives for hot-key aggregations and joins.
 *
 * At 100 TB a handful of hot keys (the empty document, a null user id,
 * a viral item) can pin one reducer while 999 executors idle. Two
 * standard answers, both here:
 *
 *   - AQE skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`,
 *     default on) handles JOIN skew at runtime — nothing to code.
 *   - Aggregation skew needs salting: spray each hot key across
 *     `salts` sub-keys, aggregate partially per (key, salt), then
 *     merge the partials per key. Correct for any commutative
 *     associative aggregate; [[saltedAgg]] implements count/sum/min/max.
 *
 * The salt must be deterministic (oracle-verifiable, retry-stable) yet
 * uncorrelated with the data: `xxhash64` of a uniquifying column, mod
 * `salts`. Spark's map-side partial aggregation already de-skews
 * aggregates whose per-key state is tiny; salting matters when the
 * partial state itself is big (collect_list/distinct) or when AQE
 * cannot rebalance a single giant group.
 */
object Skew {

  /** Deterministic salt in [0, salts) from a uniquifying column. */
  def saltOf(unique: Column, salts: Int): Column = pmod(xxhash64(unique), lit(salts))

  /**
   * Two-phase salted aggregation: COUNT + SUM + MIN + MAX of `valCol`
   * per `keyCol`, skew-safe. Phase 1 aggregates per (key, salt) —
   * spreading a hot key over `salts` reducers; phase 2 merges the ≤
   * `salts` partial rows per key (trivially small).
   */
  def saltedStats(df: DataFrame, keyCol: String, valCol: String,
                  uniqueCol: String, salts: Int = 16): DataFrame =
    df.withColumn("__salt", saltOf(col(uniqueCol), salts))
      .groupBy(col(keyCol), col("__salt"))
      .agg(
        count(lit(1)).as("__n"),
        sum(col(valCol)).as("__sum"),
        min(col(valCol)).as("__min"),
        max(col(valCol)).as("__max"))
      .groupBy(col(keyCol))
      .agg(
        sum(col("__n")).as("n"),
        sum(col("__sum")).as("sum_val"),
        min(col("__min")).as("min_val"),
        max(col("__max")).as("max_val"))

  /**
   * Salted broadcast-side replication for a skewed equi-join: the big
   * skewed side gets a salt; the small side is exploded `salts`× so
   * every (key, salt) bucket finds its match. Use when the small side
   * fits broadcast but AQE's skew split cannot kick in (e.g. a
   * bucketed/sorted big side you don't want re-shuffled).
   */
  def saltedJoinSmallSide(big: DataFrame, small: DataFrame, key: String,
                          uniqueCol: String, salts: Int = 16): DataFrame = {
    val saltedBig = big.withColumn("__salt", saltOf(col(uniqueCol), salts))
    val explodedSmall = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedBig.join(broadcast(explodedSmall), Seq(key, "__salt")).drop("__salt")
  }
}
