package graft

import graft.functions.MGBuffer
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck certification of the Misra-Gries sketch bounds the
  * heavy-hitter operator's guarantee rests on (SURVEY §2.11 row):
  * driven on the pure [[MGBuffer]] — the same state/merge code the
  * Catalyst aggregate executes — under random streams and RANDOM
  * partition splits, i.e. arbitrary map-side partial/merge trees. */
object MisraGriesProps extends Properties("MisraGries") {

  private val kGen = Gen.choose(2, 12)
  // small alphabet → heavy collisions → the decrement paths actually fire
  private val streamGen: Gen[List[String]] =
    Gen.listOf(Gen.choose(0, 25).map(i => s"w$i"))

  /** Feed `items` through buffers split at `cuts`, then merge — an
    * arbitrary two-level partial/merge tree. */
  private def sketch(items: List[String], cuts: List[Int], k: Int): MGBuffer = {
    val parts = if (cuts.isEmpty) List(items) else {
      val sorted = cuts.map(c => math.abs(c % (items.size + 1))).sorted.distinct
      (0 :: sorted).zip(sorted :+ items.size).map { case (a, b) => items.slice(a, b) }
    }
    val bufs = parts.map { p =>
      val b = new MGBuffer(k); p.foreach(b.add(_, 1L)); b
    }
    bufs.reduceLeft { (acc, o) => o.foreach((i, c) => acc.add(i, c)); acc.shrink(); acc }
  }

  property("state never exceeds k counters, under any merge tree") =
    Prop.forAll(streamGen, Gen.listOf(Gen.posNum[Int]), kGen) { (items, cuts, k) =>
      sketch(items, cuts, k).toArray.length <= k
    }

  property("every item above n/(k+1) frequency survives as a candidate") =
    Prop.forAll(streamGen, Gen.listOf(Gen.posNum[Int]), kGen) { (items, cuts, k) =>
      val kept = sketch(items, cuts, k).toArray.map(_._1).toSet
      val n = items.size
      val freq = items.groupBy(identity).map { case (i, xs) => i -> xs.size.toLong }
      freq.forall { case (i, c) => c * (k + 1) <= n || kept.contains(i) }
    }

  property("kept counters bound the true count: c ∈ [true − n/(k+1), true]") =
    Prop.forAll(streamGen, Gen.listOf(Gen.posNum[Int]), kGen) { (items, cuts, k) =>
      val n = items.size
      val freq = items.groupBy(identity).map { case (i, xs) => i -> xs.size.toLong }
        .withDefaultValue(0L)
      sketch(items, cuts, k).toArray.forall { case (i, c) =>
        c <= freq(i) && (freq(i) - c).toDouble <= n.toDouble / (k + 1)
      }
    }
}
