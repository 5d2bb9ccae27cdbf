package graft

import graft.ops.graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private val Scale = 1000000000000L

  test("pageRank: a cycle is an exact fixed point (uniform mass circulates)") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val r = graph.pageRank(edges, iters = 4)
      .as[(Long, Long)].collect().toMap
    // base + d·(scale/3) = 50_000_000_000 + 283_333_333_333 = scale/3 exactly
    assert(r == Map(1L -> 333333333333L, 2L -> 333333333333L, 3L -> 333333333333L))
  }

  test("pageRank: star center accumulates, leaves hold the base; dangling mass leaks") {
    val edges = Seq((1L, 2L), (3L, 2L)).toDF("src", "dst") // 2 is dangling
    val r = graph.pageRank(edges, iters = 1)
      .as[(Long, Long)].collect().toMap
    assert(r(1L) == 50000000000L && r(3L) == 50000000000L) // base only
    assert(r(2L) == 50000000000L + 850000L * (2 * 333333333333L) / 1000000L)
    // dangling node 2 contributed nothing: total mass < scale
    assert(r.values.sum < Scale)
  }

  test("pageRank matches a driver-side integer twin on an irregular graph") {
    val edgeSeq = Seq(
      (1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (4L, 3L), (4L, 1L), (2L, 4L))
    val iters = 3
    // twin: same fixed-point arithmetic, scalar Scala
    val nodes = edgeSeq.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val n = nodes.size
    val deg = edgeSeq.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val base = ((1000000L - 850000L) * Scale / 1000000L) / n
    var rank = nodes.map(_ -> Scale / n).toMap
    for (_ <- 0 until iters) {
      val contrib = edgeSeq
        .groupBy(_._2)
        .map { case (d, es) => d -> es.map(e => rank(e._1) / deg(e._1)).sum }
      rank = nodes.map(v =>
        v -> (base + 850000L * contrib.getOrElse(v, 0L) / 1000000L)).toMap
    }
    val got = graph.pageRank(edgeSeq.toDF("src", "dst"), iters = iters)
      .as[(Long, Long)].collect().toMap
    assert(got == rank)
  }

  test("pageRank is exactly partition-invariant") {
    val edges = (0 until 300).map(i => ((i % 17).toLong, (i % 23).toLong))
      .filter(e => e._1 != e._2)
    val a = graph.pageRank(edges.toDF("src", "dst").repartition(1))
      .as[(Long, Long)].collect().toMap
    val b = graph.pageRank(scala.util.Random.shuffle(edges).toDF("src", "dst")
        .repartition(7))
      .as[(Long, Long)].collect().toMap
    assert(a == b, "fixed-point integer ranks must not depend on layout")
  }

  test("labelPropagation: disjoint triangles settle on min ids in 2 rounds") {
    val tri = Seq((1L, 2L), (2L, 3L), (3L, 1L),
      (10L, 11L), (11L, 12L), (12L, 10L)).toDF("src", "dst")
    val r3 = graph.labelPropagation(tri, iters = 3)
      .as[(Long, Long)].collect().toMap
    // each triangle converges to its smallest member's id and stays there
    assert(r3 == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L), s"got $r3")
    assert(graph.labelPropagation(tri, iters = 2)
      .as[(Long, Long)].collect().toMap == r3)

    // bridged triangles, hand-checked SYNCHRONOUS round 1 (min-label
    // ties): node 1 sees {2,3} -> 2; node 3 sees {1,2,10} -> 1 (all
    // tied, min); node 10 sees {3,11,12} -> 3 — the bridge label lands
    val bridged = tri.unionByName(Seq((3L, 10L)).toDF("src", "dst"))
    val r1 = graph.labelPropagation(bridged, iters = 1)
      .as[(Long, Long)].collect().toMap
    assert(r1 == Map(1L -> 2L, 2L -> 1L, 3L -> 1L,
      10L -> 3L, 11L -> 10L, 12L -> 10L), s"got $r1")
    // iters = 0 is the identity labeling
    val r0 = graph.labelPropagation(bridged, iters = 0)
      .as[(Long, Long)].collect().toMap
    assert(r0.forall { case (id, l) => id == l })
    // partition invariance, same discipline as pageRank
    val shuffled = graph.labelPropagation(
      tri.repartition(7), iters = 3).as[(Long, Long)].collect().toMap
    assert(shuffled == r3)
  }

  test("personalizedPageRank: mass decays with distance from seeds; " +
      "disconnected nodes get zero") {
    // seed 0 fans out to 1 and 2; 1 fans to 3 and 4; 20→0 is UPSTREAM of
    // the seed (unreachable by forward walk); 10→11 is disconnected
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 3L), (1L, 4L),
      (20L, 0L), (10L, 11L)).toDF("src", "dst")
    val r = graph.personalizedPageRank(edges, seeds = Seq(0L), iters = 3)
      .as[(Long, Long)].collect().toMap
    // seed keeps restart mass; each fan-out child splits its parent's
    // pushed mass, so sits strictly below the seed
    assert(r(0L) > 0L && r(1L) > 0L && r(3L) > 0L)
    assert(r(1L) < r(0L) && r(3L) < r(1L), s"fan-out must divide mass: $r")
    assert(r(1L) == r(2L) && r(3L) == r(4L), s"symmetric children equal: $r")
    // nodes the forward walk cannot reach carry NOTHING (plain pageRank
    // would give both nonzero base mass)
    assert(r(10L) == 0L && r(11L) == 0L && r(20L) == 0L, r.toString)
    val pr = graph.pageRank(edges, iters = 3).as[(Long, Long)].collect().toMap
    assert(pr(10L) > 0L && pr(20L) > 0L)
  }

  test("kCorePeel: planted K5 survives 3-core peeling, pendant tree peels away") {
    // K5 on {0..4} (4-regular) + a tree hung off node 0: 0-10, 10-11,
    // 10-12, 11-13 — every tree node has degree <= 3 transiently but
    // below 3 after its leaves peel; cascade needs MULTIPLE rounds
    val k5 = for { a <- 0 to 4; b <- 0 to 4 if a < b } yield (a.toLong, b.toLong)
    val tree = Seq((0L, 10L), (10L, 11L), (10L, 12L), (11L, 13L))
    val edges = (k5 ++ tree).toDF("src", "dst")
    val core = graph.kCorePeel(edges, k = 3, rounds = 4)
      .as[Long].collect().toSet
    assert(core == Set(0L, 1L, 2L, 3L, 4L), core.toString)
    // zero rounds = no peeling: every non-isolated node survives
    val all = graph.kCorePeel(edges, k = 3, rounds = 0).as[Long].collect().toSet
    assert(all == (0L to 4L).toSet ++ Set(10L, 11L, 12L, 13L))
    // k=5: even K5 dissolves (max degree 4)
    assert(graph.kCorePeel(edges, k = 5, rounds = 3).count() == 0L)
  }

  test("triangleCount: K4 has 4, path has 0; robust to direction/dups/loops") {
    // K4 on {0,1,2,3} = C(4,3) = 4 triangles, plus a pendant path 3-4-5
    val k4 = for { a <- 0 to 3; b <- 0 to 3 if a < b } yield (a.toLong, b.toLong)
    val edges = (k4 ++ Seq((3L, 4L), (4L, 5L), (6L, 6L)) ++ // loop dropped
      k4.map(_.swap) ++ k4).toDF("src", "dst")              // reversed + dup
    val n = graph.triangleCount(edges).head().getLong(0)
    assert(n == 4L, s"K4 + pendant path should have 4 triangles, got $n")
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    assert(graph.triangleCount(path).head().getLong(0) == 0L)
    // a hub star (no triangles) + one closing edge = exactly 1
    val star = (1 to 20).map(i => (0L, i.toLong)) :+ ((1L, 2L))
    assert(graph.triangleCount(star.toDF("src", "dst")).head().getLong(0) == 1L)
  }

  test("linkPredict: RA index matches hand arithmetic; adjacent pairs excluded") {
    // path 1-2-3 plus 2-4: non-adjacent pairs through z=2 (deg 3):
    // (1,3), (1,4), (3,4) each with cn=1, ra = scale/3
    val edges = Seq((1L, 2L), (2L, 3L), (2L, 4L)).toDF("src", "dst")
    val got = graph.linkPredict(edges)
      .as[(Long, Long, Long, Long)].collect().toSet
    val ra = 1000000000000L / 3
    assert(got == Set((1L, 3L, 1L, ra), (1L, 4L, 1L, ra), (3L, 4L, 1L, ra)))
    // close 1-3: that pair is now an edge and must disappear; (1,4) stays
    val got2 = graph.linkPredict(
        edges.union(Seq((3L, 1L)).toDF("src", "dst")))
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(!got2.contains((1L, 3L)) && got2.contains((1L, 4L)))
  }

  test("linkPredict: hub neighbors above maxDeg are dropped from evidence") {
    // hub 0 adjacent to 1..9 (deg 9); side path 1-100-2 (deg(100)=2)
    val hub = (1 to 9).map(i => (0L, i.toLong))
    val edges = (hub ++ Seq((1L, 100L), (100L, 2L))).toDF("src", "dst")
    // maxDeg=5 drops z=0 as evidence: (1,2) survives via z=100 only, and
    // (0,100) closes through BOTH of the deg-2 bridges z=1 and z=2
    val got = graph.linkPredict(edges, maxDeg = 5)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 2L, 1L, 500000000000L),
      (0L, 100L, 2L, 1000000000000L)))
    // with the hub allowed, (1,2) has cn=2 (z=0 and z=100)
    val loose = graph.linkPredict(edges, maxDeg = 1000)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(loose((1L, 2L)) == 2L)
  }

  test("hits: hubs point, authorities receive; fixed-point is layout-invariant") {
    // two hubs 1,2 each point at authorities 10,11; 3 points only at 10
    val edges = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L), (3L, 10L))
      .toDF("src", "dst")
    val r = graph.hits(edges, iters = 2)
      .as[(Long, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    // 10 has 3 in-edges vs 11's 2: strictly more authority
    assert(r(10L)._2 > r(11L)._2 && r(11L)._2 > 0L)
    // 1 and 2 are symmetric twin hubs: identical scores, both above 3
    assert(r(1L) == r(2L) && r(1L)._1 > r(3L)._1)
    // pure authorities have zero hub mass, pure hubs zero authority
    assert(r(10L)._1 == 0L && r(1L)._2 == 0L)
    val b = graph.hits(edges.repartition(7), iters = 2)
      .as[(Long, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(b == r, "fixed-point HITS must not depend on layout")
  }

  test("modularity: exact integer numerators; two cliques + bridge score high") {
    // two triangles joined by one bridge edge; labels = the two triangles
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L), (5L, 6L),
      (6L, 4L), (3L, 4L)).toDF("src", "dst")
    val labels = Seq((1L, 10L), (2L, 10L), (3L, 10L),
      (4L, 20L), (5L, 20L), (6L, 20L)).toDF("id", "label")
    // m=7; community 10: e_c=3, d_c = 2+2+3 = 7 -> q_num = 4*7*3 - 49 = 35
    val got = graph.modularity(edges, labels)
      .select("label", "n_nodes", "intra_edges", "degree_sum", "q_num")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == Set((10L, 3L, 3L, 7L, 35L), (20L, 3L, 3L, 7L, 35L)))
    // Q = (35+35)/(4*49) = 0.3571... — strong structure
    val q = graph.modularity(edges, labels)
      .agg(org.apache.spark.sql.functions.sum(org.apache.spark.sql.functions
        .col("q_num"))).as[Long].head()
    assert(q == 70L)
    // a random-ish partition (everyone its own community) scores <= 0
    val solo = (1L to 6L).map(i => (i, i)).toDF("id", "label")
    val qSolo = graph.modularity(edges, solo)
      .agg(org.apache.spark.sql.functions.sum(org.apache.spark.sql.functions
        .col("q_num"))).as[Long].head()
    assert(qSolo < 0L, s"singleton partition must score negative, got $qSolo")
  }

  test("bipartiteProject: co-occurrence counts with whole-basket cap") {
    val rows = Seq(
      (1L, "a"), (1L, "b"), (1L, "c"),       // basket 1: ab ac bc
      (2L, "a"), (2L, "b"),                  // basket 2: ab
      (3L, "a"), (3L, "b"), (3L, "b"),       // dup membership collapses
      (4L, "x"), (4L, "y"), (4L, "z"), (4L, "w")) // size 4: dropped at cap 3
      .toDF("basket", "item")
    val got = graph.bipartiteProject(rows, "basket", "item", maxBasket = 3)
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(("a", "b", 3L), ("a", "c", 1L), ("b", "c", 1L)))
    val min2 = graph.bipartiteProject(rows, "basket", "item",
        maxBasket = 3, minCount = 2)
      .as[(String, String, Long)].collect().toSet
    assert(min2 == Set(("a", "b", 3L)))
  }

  test("clusteringCoef: triangle corners are cliques, bridge dilutes, pendant excluded") {
    // triangle 1-2-3 plus pendant edge 3-4
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("src", "dst")
    val got = graph.clusteringCoef(edges)
      .as[(Long, Long, Long, Long)].collect()
      .map { case (id, d, t, cc) => id -> ((d, t, cc)) }.toMap
    assert(got == Map(
      1L -> ((2L, 1L, 10000L)),          // both neighbors linked
      2L -> ((2L, 1L, 10000L)),
      3L -> ((3L, 1L, 3333L))),          // 1 of 3 neighbor pairs linked
      got.toString)                       // node 4: deg 1, excluded
  }

  test("clusteringCoef: direction and duplicate edges are normalized away") {
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 3L))
      .toDF("src", "dst")
    val got = graph.clusteringCoef(edges)
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got == Seq((1L, 2L, 1L, 10000L), (2L, 2L, 1L, 10000L),
      (3L, 2L, 1L, 10000L)), got.toString)
  }

  test("bfsDistances: hop rings on a path, nearest seed wins, horizon cut") {
    // path 1-2-3-4-5-6 (directed chain) with seeds {1, 5}
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
      .toDF("src", "dst")
    val d = graph.bfsDistances(edges, seeds = Seq(1L, 5L), maxHops = 2)
      .as[(Long, Long)].collect().toMap
    assert(d == Map(1L -> 0L, 5L -> 0L, 2L -> 1L, 6L -> 1L, 3L -> 2L))
    // 4 is 3 hops from seed 1 (directed) -> beyond maxHops, absent
  }

  test("bfsDistances: maxHops 0 returns exactly the seed set") {
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val d = graph.bfsDistances(edges, seeds = Seq(7L), maxHops = 0)
      .as[(Long, Long)].collect().toMap
    assert(d == Map(7L -> 0L))
  }

  test("communityStats: triangle community is dense, path community is not") {
    // labels: {1,2,3} -> 1 (triangle), {4,5,6} -> 4 (path 4-5-6)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L), (5L, 6L))
      .toDF("src", "dst")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L), (6L, 4L))
      .toDF("id", "label")
    val got = graph.communityStats(edges, labels)
      .as[(Long, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(got(1L) == ((3L, 3L, 1000000L)), "triangle: 3/3 edges, density 1")
    assert(got(4L) == ((3L, 2L, 666666L)), "path: 2/3 edges")
  }

  test("assortativity: a star is perfectly disassortative, a cycle flat") {
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("src", "dst")
    val rs = graph.assortativity(star).head()
    assert(rs.getLong(0) == 6L, "3 undirected edges, both directions")
    assert(rs.getDouble(1) == -1.0, "hub only meets leaves")
    // a cycle has constant degree -> zero variance -> corr null
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    assert(graph.assortativity(cyc).head().isNullAt(1))
  }
}
