package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.types.{DoubleType, LongType}

/** DataFrame surface for the bounded-state top-k aggregate
  * ([[graft.functions.TopKByAgg]] — see its scaladoc for why this
  * beats a rank window at scale: k pairs of state per group and
  * MERGEABLE map-side partials, where `row_number() OVER (...)` sorts
  * every group's full row set and ships every row to one partition). */
object Ranking {
  import org.apache.spark.sql.graftbridge.Bridge.{column, expression}

  /** `array<struct<score double, id bigint>>` of the k best rows per
    * group: highest score first, ties to the smaller id — a total
    * order, so results are deterministic and oracle-hashable. NULL
    * scores/ids are ignored; NaN ranks above +Inf (filter upstream). */
  def topKBy(score: Column, id: Column, k: Int): Column =
    column(graft.functions.TopKByAgg(
      expression(score.cast(DoubleType)), expression(id.cast(LongType)), k)
      .toAggregateExpression())

  /** DETERMINISTIC per-group MODE of an integral column (most frequent
    * value; ties to the SMALLEST value — native `mode()` leaves ties
    * engine/plan-dependent, which disqualifies it from any verified
    * pipeline): two keyed aggregates — value counts, then the k=1
    * [[topKBy]] heap over (count, value) — both map-side combined,
    * state O(distinct values) then O(1). Returns `(keys…, mode, n)`.
    * NULL values are ignored (SQL aggregate convention). */
  def modeBy(df: org.apache.spark.sql.DataFrame, keys: Seq[String],
             valueCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val counts = df.filter(col(valueCol).isNotNull)
      .groupBy((keys :+ valueCol).map(col): _*)
      .agg(count(lit(1)).as("__n"))
    counts.groupBy(keys.map(col): _*)
      .agg(topKBy(col("__n"), col(valueCol), 1).as("__top"))
      .select(keys.map(col) :+ element_at(col("__top"), 1).as("__m"): _*)
      .select(keys.map(col) :+ col("__m.id").as("mode")
        :+ col("__m.score").cast("bigint").as("n"): _*)
  }
}
