package graft

import graft.ops.{EventOps, Graph, TimeSeries}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DateType

/** Seeded randomized model checks: each distributed operator vs an
  * independent brute-force in-memory model over many small random
  * inputs. Catches the boundary cases hand-picked examples miss
  * (touching intervals, duplicate days, unreachable nodes, hop-cap
  * edges) while staying deterministic run-to-run. */
class ModelCheckSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(20260813L)

  test("mergeIntervals equals brute-force sweep on random interval sets") {
    for (_ <- 1 to 6) {
      val rows = Seq.fill(rnd.nextInt(40) + 1) {
        val k = s"k${rnd.nextInt(3)}"
        val s = rnd.nextInt(40)
        (k, s, s + rnd.nextInt(8))
      }
      val df = rows.map { case (k, s, e) =>
        (k, java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(19700L + s)),
          java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(19700L + e)))
      }.toDF("k", "s", "e")
      val got = EventOps.mergeIntervals(df, Seq("k"), "s", "e").collect()
        .map(r => (r.getString(0), r.getDate(1).toLocalDate.toEpochDay - 19700L,
          r.getDate(2).toLocalDate.toEpochDay - 19700L, r.getLong(3))).toSet
      // model: sort per key, sweep, merge when start <= running max end
      val want = rows.groupBy(_._1).flatMap { case (k, ivs) =>
        val sorted = ivs.map(iv => (iv._2.toLong, iv._3.toLong)).sorted
        val islands = scala.collection.mutable.ListBuffer[(Long, Long, Long)]()
        for ((s, e) <- sorted) {
          if (islands.nonEmpty && s <= islands.last._2)
            islands(islands.length - 1) =
              (islands.last._1, math.max(islands.last._2, e), islands.last._3 + 1)
          else islands += ((s, e, 1L))
        }
        islands.map(i => (k, i._1, i._2, i._3))
      }.toSet
      assert(got == want, s"rows=$rows")
    }
  }

  test("trailingFeatures equals brute-force window on random daily series") {
    for (_ <- 1 to 4) {
      val days = Seq.fill(rnd.nextInt(25) + 1)(("A", rnd.nextInt(60)))
        .distinct.map { case (k, d) => (k, d, (rnd.nextInt(20000) - 10000) / 100.0) }
      val df = days.map { case (k, d, v) =>
        (k, java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(19700L + d)), v)
      }.toDF("k", "d", "v")
      val got = TimeSeries.trailingFeatures(df, Seq("k"), "d", "v", Seq(7))
        .collect().map(r => (r.getDate(1).toLocalDate.toEpochDay - 19700L) ->
          ((r.getDouble(3), r.getLong(4)))).toMap
      for ((_, d, _) <- days) {
        val inWin = days.filter(x => x._2 <= d && x._2 > d - 7)
        val wantSum = inWin.map(x => BigDecimal(x._3).setScale(2)).sum.toDouble
        val (gs, gc) = (got(d.toLong)._1, got(d.toLong)._2)
        assert(gc == inWin.size.toLong && math.abs(gs - wantSum) < 1e-9,
          s"day $d: got ($gs, $gc) want ($wantSum, ${inWin.size})")
      }
    }
  }

  test("shortestPaths and weightedShortestPaths equal model relaxation on random digraphs") {
    for (_ <- 1 to 4) {
      val n = rnd.nextInt(8) + 4
      val edges = (for {
        s <- 0 until n; t <- 0 until n
        if s != t && rnd.nextDouble() < 0.25
      } yield (s.toLong, t.toLong, (rnd.nextInt(9) + 1).toLong)).toSeq
      if (edges.nonEmpty) {
        val maxHops = rnd.nextInt(4) + 1
        val df = edges.toDF("src", "dst", "w")
        val srcDf = Seq(0L).toDF("node")
        // model: k rounds of relaxation over (hop, weight) metrics
        def relax(metric: (Long, Long, Long) => Long): Map[Long, Long] = {
          var dist = Map(0L -> 0L)
          for (_ <- 1 to maxHops) {
            val cand = edges.flatMap { case (s, t, w) =>
              dist.get(s).map(ds => t -> metric(ds, w, 1L))
            }
            dist = (dist.toSeq ++ cand).groupBy(_._1).map { case (k, v) => k -> v.map(_._2).min }
          }
          dist
        }
        val bfsGot = Graph.shortestPaths(df, srcDf, maxHops)
          .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
        assert(bfsGot == relax((ds, _, one) => ds + one), s"edges=$edges hops=$maxHops")
        val wGot = Graph.weightedShortestPaths(df, srcDf, maxHops, "w")
          .as[(Long, Long)].collect().toMap
        assert(wGot == relax((ds, w, _) => ds + w), s"edges=$edges hops=$maxHops")
      }
    }
  }
}
