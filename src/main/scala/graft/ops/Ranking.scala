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
}
