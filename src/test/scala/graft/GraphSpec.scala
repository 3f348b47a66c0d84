package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graph

class GraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def edges(es: (Long, Long, Long)*) =
    es.toDF("src", "dst", "weight")

  test("pagerank: a uniform cycle is an exact fixed point of the integer iteration") {
    // 3-cycle, weight 1: share == full rank, 0.15 + 0.85·1.0 == 1.0, and
    // the fixed-point arithmetic hits it EXACTLY (1e12·17 divides by 20)
    val r = Graph.pageRank(edges((1L, 2L, 1L), (2L, 3L, 1L), (3L, 1L, 1L)),
      iterations = 8).as[(Long, Long)].collect().toMap
    assert(r == Map(1L -> Graph.Scale, 2L -> Graph.Scale, 3L -> Graph.Scale))
  }

  test("pageRankExact: dangling mass is conserved to the fixed-point unit") {
    // star-into-sink: node 4 has no out-edges; the leaky variant bleeds
    // its whole 0.85 share every iteration, the exact variant returns it
    val es = Seq((1L, 4L, 1L), (2L, 4L, 1L), (3L, 4L, 1L), (1L, 2L, 1L))
    val iters = 8
    val exact = Graph.pageRankExact(edges(es: _*), iterations = iters)
      .as[(Long, Long)].collect().toMap
    val leaky = Graph.pageRank(edges(es: _*), iterations = iters)
      .as[(Long, Long)].collect().toMap
    val n = 4L
    val ideal = n * Graph.Scale
    // loss bound: each of the ≤ 2·|E| share DIVs, the D DIV n split and
    // the per-node ·17 DIV 20 floor drops < 1 unit per iteration
    val bound = iters.toLong * (2L * es.length + n + n)
    assert(ideal - exact.values.sum <= bound && exact.values.sum <= ideal,
      s"exact total ${exact.values.sum} vs ideal $ideal (bound $bound)")
    assert(leaky.values.sum < exact.values.sum - Graph.Scale / 10,
      "the leaky variant must visibly bleed the sink's mass")
    // no dangling nodes -> the two variants are identical
    val cyc = Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 1L, 1L))
    val a = Graph.pageRankExact(edges(cyc: _*), iterations = 4)
      .as[(Long, Long)].collect().toMap
    val b = Graph.pageRank(edges(cyc: _*), iterations = 4)
      .as[(Long, Long)].collect().toMap
    assert(a == b, "without dangling nodes exact must equal classic")
  }

  test("personalized pagerank: all-seeds equals classic; unseeded mass decays exactly") {
    val es = edges((1L, 2L, 1L), (2L, 3L, 1L), (3L, 1L, 1L),
      (4L, 5L, 1L), (5L, 4L, 1L)) // 3-cycle + separate 2-cycle
    val allNodes = (1L to 5L).toDF("node")
    val classic = Graph.pageRank(es, iterations = 6)
      .as[(Long, Long)].collect().toMap
    val seededAll = Graph.pageRank(es, iterations = 6,
      teleportSeeds = Some(allNodes)).as[(Long, Long)].collect().toMap
    assert(seededAll == classic, "seeding every node must equal classic PR")
    val p = Graph.pageRank(es, iterations = 6,
      teleportSeeds = Some(Seq(1L).toDF("node")))
      .as[(Long, Long)].collect().toMap
    // the unseeded 2-cycle gets no teleport: its rank is exactly the
    // 6-fold integer (·17 DIV 20) decay of the initial mass
    var decay = Graph.Scale
    for (_ <- 1 to 6) decay = decay * 17L / 20L
    assert(p(4L) == decay && p(5L) == decay)
    assert(p(1L) > p(4L), "seeded component must outrank the unseeded one")
  }

  test("hits: star and chain hit their exact fixed points; partition-independent") {
    // out-star: center 1 -> leaves 2..5. Center is the pure hub,
    // leaves are pure (max-normalized, equal) authorities.
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)).toDF("src", "dst")
    val s = Graph.hits(star, iterations = 4)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(s(1L) == ((Graph.HitsScale, 0L)))
    (2L to 5L).foreach(l => assert(s(l) == ((0L, Graph.HitsScale))))
    // chain a -> b -> c: b and c tie as authorities, a and b as hubs
    val chain = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val c = Graph.hits(chain, iterations = 4)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(c(1L) == ((Graph.HitsScale, 0L)))
    assert(c(2L) == ((Graph.HitsScale, Graph.HitsScale)))
    assert(c(3L) == ((0L, Graph.HitsScale)))
    val re = Graph.hits(chain.repartition(5, col("dst")), iterations = 4)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(re == c)
  }

  test("pagerank: bidirectional star concentrates rank on the hub") {
    val leaves = (2L to 6L)
    val es = leaves.flatMap(l => Seq((1L, l, 1L), (l, 1L, 1L)))
    val r = Graph.pageRank(edges(es: _*), iterations = 12)
      .as[(Long, Long)].collect().toMap
    val hub = r(1L)
    leaves.foreach(l => assert(hub > 2 * r(l),
      s"hub rank $hub should dominate leaf ${r(l)}"))
    // no dangling nodes: total mass conserved up to one floor per
    // node-iteration (6 nodes · 12 iterations · 1 ulp each of the two DIVs)
    val total = r.values.sum
    assert(total <= 6 * Graph.Scale &&
      total > 6 * Graph.Scale - 6L * 12 * 2 * 20)
  }

  test("pagerank: weights matter — the heavier edge's target outranks") {
    // 1 -> 2 (w=9), 1 -> 3 (w=1), plus return edges so nothing dangles
    val r = Graph.pageRank(
      edges((1L, 2L, 9L), (1L, 3L, 1L), (2L, 1L, 1L), (3L, 1L, 1L)),
      iterations = 12).as[(Long, Long)].collect().toMap
    assert(r(2L) > r(3L))
    assert(r(1L) > r(2L)) // everything returns to 1
  }

  test("pagerank: bit-identical under repartitioning and checkpointed iteration") {
    val es = (1L to 40L).map(i => (i, i % 7 + 1, i % 3 + 1))
    val plain = Graph.pageRank(edges(es: _*), iterations = 6)
      .as[(Long, Long)].collect().toSet
    val reparted = Graph.pageRank(edges(es: _*).repartition(13), iterations = 6)
      .as[(Long, Long)].collect().toSet
    val checkpointed = Graph.pageRank(edges(es: _*), iterations = 6,
      checkpointEvery = 2).as[(Long, Long)].collect().toSet
    assert(plain == reparted)
    assert(plain == checkpointed)
  }

  test("transitionEdges: consecutive events per session, weighted") {
    val ev = Seq(
      (1L, 1L, 10L), (1L, 2L, 20L), (1L, 3L, 10L), (1L, 4L, 20L),
      (2L, 1L, 10L), (2L, 2L, 20L)).toDF("user", "seq", "page")
    val e = Graph.transitionEdges(ev, col("user"), col("page"), col("seq"))
      .as[(Long, Long, Long)].collect().toSet
    assert(e == Set((10L, 20L, 3L), (20L, 10L, 1L)))
  }

  test("triangles: K4 has four triangles, three per node; wedge-only nodes absent") {
    // K4 on 1..4 plus a pendant edge 4-5 (5 closes nothing)
    val und = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L)).toDF("a", "b")
    val t = Graph.triangleCounts(und).as[(Long, Long)].collect().toMap
    assert(t == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("triangles: partition-independent and orientation handles skewed hubs") {
    // hub 0 connected to 1..30, ring among 1..30 => triangles (0, i, i+1)
    val ring = (1L to 29L).map(i => (i, i + 1))
    val hub = (1L to 30L).map(i => (0L, i))
    val und = (ring ++ hub).toDF("a", "b")
    val t = Graph.triangleCounts(und).as[(Long, Long)].collect().toMap
    assert(t(0L) == 29L) // one per ring edge
    assert(t(1L) == 1L && t(15L) == 2L)
    val t2 = Graph.triangleCounts(und.repartition(17))
      .as[(Long, Long)].collect().toMap
    assert(t == t2)
  }

  test("kcore: K5 with pendant chain peels down to exactly the K5 at k=4") {
    // K5 on 1..5 (each degree 4), chain 5-6-7 hangs off it
    val k5 = for (i <- 1L to 5L; j <- (i + 1) to 5L) yield (i, j)
    val und = (k5 ++ Seq((5L, 6L), (6L, 7L))).toDF("a", "b")
    val core = Graph.kCore(und, k = 4).as[(Long, Long)].collect().toMap
    assert(core == (1L to 5L).map(_ -> 4L).toMap)
    // k=5: nothing survives
    assert(Graph.kCore(und, k = 5).isEmpty)
  }

  test("kcore: cascade — removing one node drops neighbors below k transitively") {
    // a 4-cycle (degree 2 each) + a tail: at k=2 the tail peels away
    // round by round, the cycle survives
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L),
      (4L, 5L), (5L, 6L), (6L, 7L)).toDF("a", "b")
    val core = Graph.kCore(und, k = 2, rounds = 8)
      .as[(Long, Long)].collect().toMap
    assert(core == Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 2L))
  }

  test("kcore: declared-config fixpoint — one more round changes nothing") {
    val sfDir = "/root/testdata/sf0.001"
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey"))
    val co = li.alias("x").join(li.alias("y"),
        col("x.l_orderkey") === col("y.l_orderkey") &&
          col("x.l_partkey") < col("y.l_partkey"))
      .groupBy(col("x.l_partkey").as("a"), col("y.l_partkey").as("b"))
      .agg(count(lit(1)).as("w"))
      .filter(col("w") >= 2)
    val r8 = Graph.kCore(co, k = 2, rounds = 8)
      .as[(Long, Long)].collect().toSet
    val r9 = Graph.kCore(co, k = 2, rounds = 9)
      .as[(Long, Long)].collect().toSet
    assert(r8.nonEmpty, "declared-config core must not be empty")
    assert(r8 == r9, "8 rounds must reach the fixpoint at the declared config")
  }

  test("bfs: shortest hop wins on a diamond, cutoff truncates, unreachable absent") {
    // 1 -> 2 -> 3 -> 4 -> 5 and shortcut 1 -> 3; node 9 -> 1 is upstream
    // of the seed (directed: NOT reachable); node 7 is isolated
    val es = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 3L), (9L, 1L))
      .toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    val r = Graph.bfsHops(es, seeds, maxHops = 2)
      .as[(Long, Long)].collect().toMap
    assert(r == Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L))
  }

  test("bfs: multi-source takes the minimum over seeds; cycles terminate") {
    // ring 1 -> 2 -> 3 -> 4 -> 1 with seeds {1, 3}: everything is <= 1 hop
    val es = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    val r = Graph.bfsHops(es, Seq(1L, 3L).toDF("node"), maxHops = 4)
      .as[(Long, Long)].collect().toMap
    assert(r == Map(1L -> 0L, 3L -> 0L, 2L -> 1L, 4L -> 1L))
  }

  test("bfs: bit-identical under repartitioning") {
    val es = (1L to 40L).map(i => (i % 13, (i * 7) % 13)).toDF("src", "dst")
    val seeds = Seq(0L).toDF("node")
    val a = Graph.bfsHops(es, seeds, maxHops = 3)
    val b = Graph.bfsHops(es.repartition(7, col("dst")), seeds, maxHops = 3)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  /** Reference sync label propagation: mode of neighbor labels, min tie. */
  private def refLabelProp(und: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val adj = (und ++ und.map(_.swap)).distinct
      .groupBy(_._1).map { case (n, es) => n -> es.map(_._2) }
    var lbl: Map[Long, Long] = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to rounds) {
      lbl = adj.map { case (n, nbrs) =>
        val counts = nbrs.map(lbl).groupBy(identity)
          .map { case (l, o) => (l, o.size) }
        n -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    lbl
  }

  test("labelPropagation: bridged triangles settle into two communities") {
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L),
      (5L, 6L), (3L, 4L))
    val got = Graph.labelPropagation(und.toDF("a", "b"), rounds = 4)
      .as[(Long, Long)].collect().toMap
    assert(got == refLabelProp(und, 4))
    // the bridge 3-4 must NOT merge the triangles into one community
    assert(got(1L) == got(2L) && got(2L) == got(3L))
    assert(got(4L) == got(5L) && got(5L) == got(6L))
    assert(got(1L) != got(4L))
  }

  test("labelPropagation matches the reference on a hashed graph; partition-independent") {
    val und = (1L to 60L).map(i => (i % 14, (i * 11 + 3) % 14))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct
    val df = und.toDF("a", "b")
    val got = Graph.labelPropagation(df, rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(got == refLabelProp(und, 3))
    val re = Graph.labelPropagation(df.repartition(7, col("b")), rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(re == got)
  }

  /** The hash-choice formula, recomputed independently of Spark. */
  private def md5Mod(s: String, m: Long): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val hex = d.map(b => f"$b%02x").mkString.take(15)
    java.lang.Long.parseLong(hex, 16) % m
  }

  test("randomWalks: every step follows an edge chosen by the hash formula") {
    val es = (1L to 60L).map(i => ((i * 3) % 11, (i * 7 + 2) % 11))
      .distinct.toDF("src", "dst")
    val edgeSet: Set[(Long, Long)] = es.as[(Long, Long)].collect().toSet
    val adj: Map[Long, Seq[Long]] = edgeSet.groupBy(_._1)
      .map { case (s, p) => s -> p.map(_._2).toSeq.sorted }
    val seeds = Seq(0L, 5L, 9L).toDF("node")
    val trail = Graph.randomWalks(es, seeds, steps = 4, walksPerNode = 3)
      .as[(Long, Int, Int, Long)].collect()
      .groupBy(r => (r._1, r._2))
    assert(trail.keySet == (for (s <- Seq(0L, 5L, 9L); w <- 1 to 3)
      yield (s, w)).toSet)
    for (((start, w), rows) <- trail) {
      val path = rows.sortBy(_._3).map(_._4)
      assert(rows.map(_._3).sorted.toSeq == (0 until rows.length).toSeq,
        "steps must be dense from 0 — walks only end at dead ends")
      assert(path.head == start)
      for (t <- 1 until path.length) {
        val nbrs = adj(path(t - 1)) // must have out-edges, we walked on
        val want = nbrs(md5Mod(s"$start|$w|$t|${path(t - 1)}", nbrs.length).toInt)
        assert(path(t) == want,
          s"walk ($start,$w) step $t took ${path(t)}, hash says $want")
      }
      // a walk stops early only at a dead end
      if (path.length < 5) assert(!adj.contains(path.last))
    }
  }

  test("randomWalks: bit-identical under repartitioning") {
    val es = (1L to 80L).map(i => (i % 17, (i * 5 + 1) % 17)).toDF("src", "dst")
    val seeds = Seq(0L, 3L).toDF("node")
    val a = Graph.randomWalks(es, seeds, steps = 5, walksPerNode = 2)
    val b = Graph.randomWalks(es.repartition(9, col("dst")), seeds,
      steps = 5, walksPerNode = 2)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("markovTransitions: exact ppm rows, one modal successor per source") {
    // src 1: 2 (w=3), 3 (w=1) -> 750000 / 250000 ppm, top = 2
    // src 2: 3 (w=2), 4 (w=2) -> tie at 500000, top = min dst = 3
    val m = Graph.markovTransitions(edges(
        (1L, 2L, 3L), (1L, 3L, 1L), (2L, 3L, 2L), (2L, 4L, 2L)))
      .as[(Long, Long, Long, Long, Boolean)].collect()
      .map(r => (r._1, r._2) -> (r._4, r._5)).toMap
    assert(m((1L, 2L)) == ((750000L, true)))
    assert(m((1L, 3L)) == ((250000L, false)))
    assert(m((2L, 3L)) == ((500000L, true)), "tie must break to min dst")
    assert(m((2L, 4L)) == ((500000L, false)))
    // truncating DIV: ppm never overshoots, deficit < number of successors
    val sums = m.toSeq.groupBy(_._1._1)
      .map { case (s, rows) => s -> rows.map(_._2._1).sum }
    sums.foreach { case (s, tot) =>
      assert(tot <= 1000000L && 1000000L - tot < 4,
        s"src $s ppm total $tot out of bounds")
    }
  }

  test("linkPrediction: path and square score exactly; adjacency excluded") {
    import spark.implicits._
    // path 1-2-3: candidate (1,3) via z=2 (deg 2) -> cn=1, ra=SCALE/2
    val path = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val p = Graph.linkPrediction(path)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(p == Seq((1L, 3L, 1L, Graph.Scale / 2)))
    // square 1-2-3-4-1: diagonals (1,3) and (2,4), each via two deg-2
    // corners -> cn=2, ra=2·SCALE/2; edges themselves never reappear
    val sq = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("a", "b")
    val q = Graph.linkPrediction(sq)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(q == Set((1L, 3L, 2L, Graph.Scale), (2L, 4L, 2L, Graph.Scale)))
    val re = Graph.linkPrediction(sq.repartition(7, col("b")))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(re == q)
  }

  test("shortestPaths: cheap detour beats direct edge; rounds bound path length") {
    // 1→3 direct costs 10; 1→2→3 costs 2+3=5. With 1 round only the
    // direct edge is visible; 2 rounds find the detour. 4 unreachable.
    val e = Seq((1L, 3L, 10L), (1L, 2L, 2L), (2L, 3L, 3L), (5L, 4L, 1L))
      .toDF("src", "dst", "weight")
    val seeds = Seq(1L).toDF("node")
    val r1 = Graph.shortestPaths(e, seeds, rounds = 1)
      .as[(Long, Long)].collect().sorted.toSeq
    assert(r1 == Seq((1L, 0L), (2L, 2L), (3L, 10L)))
    val r2 = Graph.shortestPaths(e, seeds, rounds = 2)
      .as[(Long, Long)].collect().sorted.toSeq
    assert(r2 == Seq((1L, 0L), (2L, 2L), (3L, 5L)))
    val rep = Graph.shortestPaths(e.repartition(5), seeds, rounds = 2)
      .as[(Long, Long)].collect().sorted.toSeq
    assert(rep == r2)
  }

  test("communityMetrics: two bridged triangles, hand-checked integers") {
    // triangles {1,2,3} and {4,5,6} bridged by 3-4; m = 7
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L),
      (5L, 6L), (3L, 4L)).toDF("a", "b")
    val lab = Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 20L), (5L, 20L),
      (6L, 20L)).toDF("node", "label")
    val out = Graph.communityMetrics(und, lab).collect()
      .map(r => r.getLong(0) -> r).toMap
    for (c <- Seq(10L, 20L)) {
      val r = out(c)
      assert(r.getLong(1) == 3L)                  // n_nodes
      assert(r.getLong(2) == 3L)                  // internal
      assert(r.getLong(3) == 1L)                  // cut: the bridge
      assert(r.getLong(4) == 7L)                  // volume 2+2+3
      assert(r.getLong(5) == 4 * 7 * 3 - 49L)     // 35
      assert(r.getLong(6) == 1000000L / 7L)       // 142857
    }
    // modularity of the partition: Q·4m² = Σ = 70 -> Q = 70/196 ≈ 0.357
    assert(out.values.map(_.getLong(5)).sum == 70L)
    val rep = Graph.communityMetrics(und.repartition(5), lab.repartition(3))
      .collect().map(r => r.getLong(0) -> r.getLong(6)).toMap
    assert(rep == out.map { case (k, r) => k -> r.getLong(6) })
  }

  test("degreeHistogram: pow2 bins, exact shares, star hub isolated") {
    // star: hub 1 with 4 leaves -> degrees {4, 1, 1, 1, 1}
    val und = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)).toDF("a", "b")
    val out = Graph.degreeHistogram(und)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(out == Seq(
      (1L, 4L, 1L, 1L, 800000L),
      (4L, 1L, 4L, 4L, 200000L)))
    // degree 3 lands in the (2, 4] bucket
    val tri = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L)).toDF("a", "b")
    val b = Graph.degreeHistogram(tri)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(b.map(_._1) == Seq(1L, 2L, 4L))
    assert(b.last == (4L, 1L, 3L, 3L, 250000L))
  }

  test("communityMetrics: single community has zero cut and NULL conductance") {
    val und = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val lab = Seq((1L, 1L), (2L, 1L), (3L, 1L)).toDF("node", "label")
    val r = Graph.communityMetrics(und, lab).collect().head
    assert(r.getLong(3) == 0L)  // no cut edges
    assert(r.getLong(4) == 4L)  // volume = 2m
    assert(r.isNullAt(6))       // conductance undefined: other side empty
    // modularity_num = 4*2*2 - 16 = 0 — a single community scores zero
    assert(r.getLong(5) == 0L)
  }
}
