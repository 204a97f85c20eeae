package graft

import graft.ops.Graph
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def edges(pairs: (Long, Long)*) = pairs.toDF("src", "dst")

  test("pageRank on a symmetric 2-cycle stays uniform at every round") {
    // each node forwards its whole rank to the other: the uniform
    // distribution is the fixed point, so every iterate is exactly 0.5
    val r = Graph.pageRank(edges((1L, 2L), (2L, 1L)), iterations = 3)
      .orderBy("node").as[(Long, Double)].collect()
    assert(r.map(_._1).toSeq == Seq(1L, 2L))
    r.foreach { case (_, rank) => assert(rank === 0.5) }
  }

  test("pageRank on a directed chain ranks downstream nodes higher") {
    // 1 -> 2 -> 3: rank accumulates downstream; 3 is dangling (leaks),
    // which is the documented semantic
    val r = Graph.pageRank(edges((1L, 2L), (2L, 3L)), iterations = 3)
      .orderBy("node").as[(Long, Double)].collect().map(_._2)
    assert(r(0) < r(1) && r(1) < r(2))
    // no dangling redistribution → total mass strictly below 1
    assert(r.sum < 1.0 && r.forall(_ > 0))
  }

  test("pageRank mass is conserved on symmetrized graphs") {
    val undirected = edges((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (3L, 4L), (4L, 3L))
    val r = Graph.pageRank(undirected, iterations = 5).as[(Long, Double)].collect()
    // no dangling nodes → Σ rank = 1 up to decimal-exact rounding
    assert(math.abs(r.map(_._2).sum - 1.0) < 1e-12)
    // symmetric chain 1-2-3-4: interior nodes outrank endpoints, and the
    // mirror symmetry (1↔4, 2↔3) is exact
    val byNode = r.toMap
    assert(byNode(2L) > byNode(1L) && byNode(3L) > byNode(4L))
    assert(byNode(1L) == byNode(4L) && byNode(2L) == byNode(3L))
  }

  test("weighted pageRank splits rank by weight; weight 1 equals unweighted exactly") {
    import org.apache.spark.sql.functions.lit
    // hub 1 favors 2 (weight 3) over 3 (weight 1); back-edges close the loop
    val weighted = Seq((1L, 2L, 3L), (1L, 3L, 1L), (2L, 1L, 1L), (3L, 1L, 1L))
      .toDF("src", "dst", "w")
    val r = Graph.pageRank(weighted, iterations = 3, weightCol = Some("w"))
      .as[(Long, Double)].collect().toMap
    assert(r(2L) > r(3L), "heavier edge must carry more rank")

    val base = edges((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L))
    val unweighted = Graph.pageRank(base, iterations = 3)
      .orderBy("node").as[(Long, Double)].collect().toSeq
    val weightOne = Graph.pageRank(base.withColumn("w", lit(1L)), iterations = 3,
      weightCol = Some("w")).orderBy("node").as[(Long, Double)].collect().toSeq
    assert(unweighted == weightOne) // bit-identical, not approximately
  }

  test("weighted pageRank rejects non-positive, NULL, and overflow-range weights") {
    val bad = Seq((1L, 2L, 0L), (2L, 1L, 1L)).toDF("src", "dst", "w")
    intercept[IllegalArgumentException] {
      Graph.pageRank(bad, iterations = 1, weightCol = Some("w"))
    }
    // min/max skip NULLs — a NULL weight would otherwise slip past the
    // positivity check and silently drop its edge's mass
    val withNull = Seq((1L, 2L, Some(1L)), (2L, 1L, Option.empty[Long]))
      .toDF("src", "dst", "w")
    val en = intercept[IllegalArgumentException] {
      Graph.pageRank(withNull, iterations = 1, weightCol = Some("w"))
    }
    assert(en.getMessage.contains("NULL"))
    val huge = Seq((1L, 2L, Long.MaxValue / Graph.SCALE + 1), (2L, 1L, 1L))
      .toDF("src", "dst", "w")
    val e = intercept[IllegalArgumentException] {
      Graph.pageRank(huge, iterations = 1, weightCol = Some("w"))
    }
    assert(e.getMessage.contains("overflow"))
  }

  test("pageRankConverged stops at the exact fixed point and reports rounds") {
    // 2-cycle: the uniform start IS the fixed point — one probe round
    // suffices even at zero tolerance
    val (r2, rounds2) = Graph.pageRankConverged(edges((1L, 2L), (2L, 1L)),
      maxIter = 10, tolUnits = 0L)
    assert(rounds2 == 1)
    r2.as[(Long, Double)].collect().foreach { case (_, rank) => assert(rank === 0.5) }

    // symmetric chain: converged ranks agree with a deep fixed-iteration
    // run to within the tolerance, and it takes more than one round.
    // damping 0.5 so the contraction reaches 1e-9 rank units in ~30
    // rounds (at 0.85 the same tolerance needs ~130)
    val chain = edges((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (3L, 4L), (4L, 3L))
    val (rc, rounds) = Graph.pageRankConverged(chain, maxIter = 50,
      tolUnits = 1000000L, dampingPerMille = 500)
    assert(rounds > 1 && rounds < 50)
    val deep = Graph.pageRank(chain, iterations = 40, dampingPerMille = 500)
      .as[(Long, Double)].collect().toMap
    rc.as[(Long, Double)].collect().foreach { case (node, rank) =>
      assert(math.abs(rank - deep(node)) < 1e-8)
    }
  }

  test("pageRankConverged fails loudly when maxIter is too small") {
    val chain = edges((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L))
    val ex = intercept[IllegalArgumentException] {
      Graph.pageRankConverged(chain, maxIter = 1, tolUnits = 0L)
    }
    assert(ex.getMessage.contains("still moving"))
  }

  test("triangles: per-node counts, lcc, and canonicalization of messy input") {
    // two triangles sharing edge (2,3), plus pendant 5 on node 1; input
    // is deliberately messy: duplicates, reversed copies, a self-loop
    val e = edges(
      (1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (2L, 4L), (5L, 1L),
      (2L, 1L), (1L, 2L), (3L, 3L)) // reversed dup, exact dup, self-loop
    val r = Graph.triangles(e).orderBy("node")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(r == Seq(
      (1L, 3L, 1L, 1.0 / 3.0), // neighbors {2,3,5}; one closed pair of 3
      (2L, 3L, 2L, 2.0 / 3.0), // neighbors {1,3,4}; two closed pairs
      (3L, 3L, 2L, 2.0 / 3.0),
      (4L, 2L, 1L, 1.0),       // both neighbors adjacent
      (5L, 1L, 0L, 0.0)))      // degree < 2: lcc pinned to 0
  }

  test("triangles: triangle-free graphs count zero everywhere") {
    // a star and a 4-cycle — wedges exist but never close
    val r = Graph.triangles(edges((1L, 2L), (1L, 3L), (1L, 4L),
      (10L, 11L), (11L, 12L), (12L, 13L), (13L, 10L)))
      .as[(Long, Long, Long, Double)].collect()
    assert(r.forall(t => t._3 == 0L && t._4 == 0.0))
    assert(r.length == 8)
  }

  test("shortestPaths: BFS hop distances, hop cap, early exit, multi-source min") {
    // directed chain 1→2→3→4→5 plus a shortcut 1→4; source {1}
    val chain = edges((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 4L))
    val src1 = Seq(1L).toDF("node")
    val d = Graph.shortestPaths(chain, src1, maxHops = 10)
      .as[(Long, Int)].collect().toMap
    assert(d == Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 1, 5L -> 2),
      "shortcut wins over the longer chain path; early exit past hop 2")
    // hop cap truncates reach
    val capped = Graph.shortestPaths(chain, src1, maxHops = 1)
      .as[(Long, Int)].collect().toMap
    assert(capped == Map(1L -> 0, 2L -> 1, 4L -> 1))
    // multi-source: distance is min over sources; disconnected node 99 absent
    val multi = Graph.shortestPaths(chain.unionByName(edges((98L, 99L))),
      Seq(1L, 5L, 1L).toDF("node"), maxHops = 10).as[(Long, Int)].collect().toMap
    assert(multi == Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 1, 5L -> 0))
    // maxHops = 0: sources only
    val zero = Graph.shortestPaths(chain, src1, maxHops = 0)
      .as[(Long, Int)].collect().toMap
    assert(zero == Map(1L -> 0))
  }

  test("weightedShortestPaths: cheap detour beats direct edge, hop cap binds, guards raise") {
    import spark.implicits._
    // 1→3 direct costs 10; 1→2→3 costs 2+3=5 — two hops must win
    val we = Seq((1L, 3L, 10L), (1L, 2L, 2L), (2L, 3L, 3L), (3L, 4L, 1L))
      .toDF("src", "dst", "w")
    val src = Seq(1L).toDF("node")
    val d2 = graft.ops.Graph.weightedShortestPaths(we, src, maxHops = 2, "w")
      .as[(Long, Long)].collect().toMap
    assert(d2 == Map(1L -> 0L, 2L -> 2L, 3L -> 5L, 4L -> 11L),
      "min over <=2-edge paths: detour wins, 4 reachable only via direct-edge path")
    // hop 3 improves node 4 through the detour (5 + 1)
    val d3 = graft.ops.Graph.weightedShortestPaths(we, src, maxHops = 3, "w")
      .as[(Long, Long)].collect().toMap
    assert(d3(4L) == 6L)
    // hop cap 1: only direct neighbors
    val d1 = graft.ops.Graph.weightedShortestPaths(we, src, maxHops = 1, "w")
      .as[(Long, Long)].collect().toMap
    assert(d1 == Map(1L -> 0L, 2L -> 2L, 3L -> 10L))
    // non-positive weight fails loudly
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    val bad = Seq((1L, 2L, 0L)).toDF("src", "dst", "w")
    val e = intercept[Exception] {
      graft.ops.Graph.weightedShortestPaths(bad, src, maxHops = 1, "w").collect()
    }
    assert(chain(e).exists(_.contains("positive")), chain(e).mkString(" | "))
  }

  test("pageRank rejects empty input and zero iterations") {
    intercept[IllegalArgumentException] {
      Graph.pageRank(edges((1L, 2L)), iterations = 0)
    }
    intercept[IllegalArgumentException] {
      Graph.pageRank(edges().where(lit(false)), iterations = 1)
    }
  }

  test("kcore peels to the exact fixed point") {
    // triangle {1,2,3} + a tail 3-4-5: the 2-core is exactly the
    // triangle (4 dies first, THEN 5's degree drops — needs 2 rounds)
    val und = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
    val sym = und ++ und.map(_.swap)
    val out = Graph.kcore(edges(sym: _*), k = 2, maxRounds = 10)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 2L), (2L, 2L), (3L, 2L)))
    // k above the max core empties the graph (and still converges)
    assert(Graph.kcore(edges(sym: _*), k = 5, maxRounds = 10).count() == 0)
    // truncated peel fails loudly instead of returning a non-core
    intercept[IllegalArgumentException] {
      // a 6-node path peels one endpoint pair per round: 1 round is
      // provably not enough for k=2
      val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
      Graph.kcore(edges((path ++ path.map(_.swap)): _*), k = 2, maxRounds = 1)
    }
  }

  private def sym(pairs: (Long, Long)*) =
    edges((pairs ++ pairs.map(_.swap)): _*)

  test("linkPrediction: square predicts exactly the diagonals with jaccard 1") {
    // 1-2-3-4-1: the only 2-hop non-edges are the diagonals; each shares
    // BOTH neighbors with its partner → common=2, union=2+2-2=2
    val out = Graph.linkPrediction(sym((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)))
      .orderBy("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(out.toSeq == Seq((1L, 3L, 2L, 2L, 1.0), (2L, 4L, 2L, 2L, 1.0)))
  }

  test("linkPrediction: adjacent pairs never appear (triangle predicts nothing)") {
    val out = Graph.linkPrediction(sym((1L, 2L), (2L, 3L), (1L, 3L))).collect()
    assert(out.isEmpty)
  }

  test("linkPrediction: jaccard uses full degrees, not just shared centers") {
    // path 1-2-3 plus pendant 4 on node 3: candidate (1,3) via center 2
    // has common=1, deg(1)=1, deg(3)=2 → union=2, jaccard=0.5; candidate
    // (2,4) via center 3: deg(2)=2, deg(4)=1 → union=2, jaccard=0.5;
    // candidate (1,4)? no shared center (1-2, 4-3) → absent
    val out = Graph.linkPrediction(sym((1L, 2L), (2L, 3L), (3L, 4L)))
      .orderBy("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(out.toSeq == Seq((1L, 3L, 1L, 2L, 0.5), (2L, 4L, 1L, 2L, 0.5)))
  }

  test("linkPrediction: the center-degree cap silences hub wedges but keeps degrees") {
    // star center 0 → 1..4 (deg 4): capped at 3 the hub contributes no
    // wedges → nothing predicted; uncapped all 6 leaf pairs appear
    val star = sym((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L))
    assert(Graph.linkPrediction(star, maxCenterDegree = 3L).collect().isEmpty)
    val full = Graph.linkPrediction(star).orderBy("a", "b").collect()
    assert(full.length == 6)
    // leaves have degree 1 each, common=1 → union=1, jaccard exactly 1
    assert(full.forall(r => r.getLong(2) == 1L && r.getDouble(4) == 1.0))
  }

  test("labelPropagation: two disjoint cliques converge to distinct communities") {
    import spark.implicits._
    def clique(ids: Seq[Long]) = for {
      a <- ids; b <- ids if a != b
    } yield (a, b)
    val edges = (clique(Seq(1L, 2L, 3L)) ++ clique(Seq(10L, 11L, 12L)))
      .toDF("src", "dst")
    val out = Graph.labelPropagation(edges, rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // round 1: every clique node adopts the smallest OTHER id; round 2:
    // the smallest id dominates the neighbor label counts → all 1 / all 10
    assert(Seq(1L, 2L, 3L).map(out) == Seq(1L, 1L, 1L), s"got $out")
    assert(Seq(10L, 11L, 12L).map(out) == Seq(10L, 10L, 10L), s"got $out")
  }

  test("modularity: two perfect cliques score exactly 1/2") {
    import spark.implicits._
    def clique(ids: Seq[Long]) = for {
      a <- ids; b <- ids if a != b
    } yield (a, b)
    val edges = (clique(Seq(1L, 2L, 3L)) ++ clique(Seq(10L, 11L, 12L)))
      .toDF("src", "dst")
    val perfect = Seq((1L, 1L), (2L, 1L), (3L, 1L),
      (10L, 2L), (11L, 2L), (12L, 2L)).toDF("node", "label")
    val r = Graph.modularity(edges, perfect).collect().head
    // E2 = 12, intra = 12, d_c = 6 each → (12·12 − 72)/144 = 0.5 exactly
    assert(r.getAs[Long]("e2") == 12L && r.getAs[Long]("intra_edges") == 12L)
    assert(r.getAs[Long]("sum_deg_sq") == 72L)
    assert(r.getAs[Double]("modularity") == 0.5)
    // everything-in-one-community scores exactly 0
    val one = Seq((1L, 9L), (2L, 9L), (3L, 9L), (10L, 9L), (11L, 9L), (12L, 9L))
      .toDF("node", "label")
    assert(Graph.modularity(edges, one).collect().head
      .getAs[Double]("modularity") == 0.0)
  }

  test("randomWalks: deterministic, hops ride real edges, full length on symmetric graphs") {
    import spark.implicits._
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 3L), (2L, 4L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val seeds = Seq((1L, 1L), (4L, 4L)).toDF("walk_id", "node")
    val a = Graph.randomWalks(edges, seeds, steps = 3)
      .orderBy("walk_id", "step").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val b = Graph.randomWalks(edges.repartition(5), seeds, steps = 3)
      .orderBy("walk_id", "step").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(a == b, "walks must be layout-invariant")
    assert(a.count(_._1 == 1L) == 4 && a.count(_._1 == 4L) == 4,
      "symmetric graph: every walk runs steps+1 rows")
    val edgeSet = (und ++ und.map(_.swap)).toSet
    val byWalk = a.groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3))
    byWalk.foreach { case (_, path) =>
      path.sliding(2).foreach { case Seq(u, v) =>
        assert(edgeSet.contains((u, v)), s"hop $u->$v is not an edge")
      }
    }
  }

  test("personalizedPageRank: mass decays with distance from the seed, zero where unreachable") {
    import spark.implicits._
    // path 0-1-2-3-4 (symmetrized) + disconnected pair 10-11
    def sym(p: Seq[(Long, Long)]) = p ++ p.map(_.swap)
    val edges = sym((0L until 4L).map(i => (i, i + 1)) :+ (10L, 11L)).toDF("src", "dst")
    val seeds = Seq(0L).toDF("node")
    val r = Graph.personalizedPageRank(edges, seeds, iterations = 8)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r(0L) > r(1L) && r(1L) > r(2L) && r(2L) > r(3L),
      s"rank must decay along the path from the seed: $r")
    assert(r(10L) == 0.0 && r(11L) == 0.0,
      s"components unreachable from the seeds carry zero mass: $r")
    // a seed absent from the graph is ignored; all-absent seeds fail loudly
    val r2 = Graph.personalizedPageRank(edges, Seq(0L, 999L).toDF("node"), 2)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(!r2.contains(999L) && r2(0L) > 0.0)
    intercept[IllegalArgumentException] {
      Graph.personalizedPageRank(edges, Seq(999L).toDF("node"), 2).collect()
    }
  }

  test("pageRankResume: warm start beats cold start and matches units round-trip") {
    import spark.implicits._
    // base graph: a 30-node binary tree (IRREGULAR degrees — a regular
    // graph's fixed point is uniform, where cold start is already
    // converged and warm start can't win); delta: two new leaves —
    // small relative mass, so prior ranks are near the new fixed point
    def sym(p: Seq[(Long, Long)]) = p ++ p.map(_.swap)
    val tree = sym((1L until 30L).map(i => (i, (i - 1) / 2)))
    val delta = sym(Seq((30L, 3L), (31L, 5L)))
    val e0 = tree.toDF("src", "dst")
    val eAll = (tree ++ delta).toDF("src", "dst")
    val prior = Graph.pageRankUnits(e0, iterations = 6)
    def ranks(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
      df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // damping 0.85 contracts ~0.85^r: 1e-8 rank units needs ~115 rounds
    val converged = ranks(Graph.pageRankConverged(eAll, maxIter = 150,
      tolUnits = 10000000L)._1)
    val warm = ranks(Graph.pageRankResume(eAll, prior, iterations = 3))
    val cold = ranks(Graph.pageRank(eAll, iterations = 3))
    def l1(m: Map[Long, Double]): Double =
      converged.map { case (k, v) => math.abs(m(k) - v) }.sum
    assert(l1(warm) < l1(cold),
      s"warm start must be closer to the fixed point: warm=${l1(warm)} cold=${l1(cold)}")
    // new nodes seed at 1/n and participate
    assert(warm.contains(30L) && warm(30L) > 0.0 && warm.contains(31L))
    // resuming zero extra information (same edges, prior = cold init)
    // reproduces pageRank exactly — the unit/double round trip is exact
    val uniformPrior = Graph.pageRankUnits(eAll, iterations = 1)
    val viaResume = ranks(Graph.pageRankResume(eAll, uniformPrior, iterations = 2))
    val direct = ranks(Graph.pageRank(eAll, iterations = 3))
    assert(viaResume == direct,
      "resume(units after r rounds, k more) must equal pageRank(r + k) bit-for-bit")
  }

  test("hits matches a plain-Scala integer fixed-point replay on a bipartite graph") {
    import spark.implicits._
    // customers (even) -> suppliers (odd); node 0 buys from everyone
    val edges = Seq((0L, 1L), (0L, 3L), (0L, 5L), (0L, 7L),
      (2L, 1L), (2L, 3L), (4L, 5L))
    val out = Graph.hits(edges.toDF("src", "dst"), iterations = 2)
      .orderBy("node").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    // independent replay of the exact integer recurrence
    val S = Graph.HITS_SCALE
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    def renorm(m: Map[Long, Long]) = {
      val d = m.values.max / S + 1
      m.map { case (k, v) => k -> v / d }
    }
    var hub = nodes.map(n => n -> S).toMap
    var auth = Map.empty[Long, Long]
    (1 to 2).foreach { _ =>
      auth = renorm(nodes.map(n =>
        n -> edges.filter(_._2 == n).map(e => hub(e._1)).sum).toMap)
      hub = renorm(nodes.map(n =>
        n -> edges.filter(_._1 == n).map(e => auth(e._2)).sum).toMap)
    }
    val exp = nodes.map(n => (n, hub(n).toDouble / S, auth(n).toDouble / S))
    assert(out.toSeq == exp)
    // structure: the buy-from-everyone customer is the top hub; the
    // sides are pure (bipartite semantics, not a bug)
    val custs = out.filter(_._1 % 2 == 0)
    assert(custs.maxBy(_._2)._1 == 0L)
    assert(custs.forall(_._3 == 0.0), "customers have no in-edges: authority 0")
    assert(out.filter(_._1 % 2 == 1).forall(_._2 == 0.0),
      "suppliers have no out-edges: hub 0")
  }

  test("hits rejects an empty edge list and bad iteration counts") {
    import spark.implicits._
    intercept[IllegalArgumentException] {
      Graph.hits(Seq.empty[(Long, Long)].toDF("src", "dst"), iterations = 1)
    }
    intercept[IllegalArgumentException] {
      Graph.hits(Seq((1L, 2L)).toDF("src", "dst"), iterations = 0)
    }
  }
}
