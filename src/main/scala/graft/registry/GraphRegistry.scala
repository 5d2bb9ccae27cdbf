package graft.registry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkEntry._
import graft.core.{Cmp, Metric, VecStore}
import graft.functions.{hashing, vectors}
import graft.ops.{ann, asof, bpe, decontam, dedup, evals, multimodal, rel, retrieval, sample, sketch, text, unigram}
import graft.streaming.EventStream

/** graph-family query registry: each Spark-side query with its DuckDB
  * oracle SQL immediately adjacent (mechanical split of SparkEntry,
  * round 15 — no behavior change; SparkEntry composes the families). */
private[graft] object GraphRegistry extends Registry {

    // deterministic fixed-point PageRank over the kNN similarity graph —
    // document centrality for curation; every rank is an exact long.
    // Edges come from the memoized [[knnEdges]] parquet (graph built
    // once, ranked many times); knnGraph is deterministic, so the
    // persisted edges are value-identical to a live build.
  b.q(
    "graph_pagerank" -> ((s, dir) =>
      graft.ops.graph.pageRank(
          s.read.parquet(knnEdges(s, dir)), iters = 3)
        .orderBy(col("id")))
  )
    // 3 unrolled integer iterations over the kNN edges; every rank is a
    // long, so the compare is hash-exact with no float discipline at all.
  b.o(
    "graph_pagerank" -> {
      val base = "((1000000 - 850000) * 1000000000000 // 1000000) // (SELECT n FROM nn)"
      val iterCtes = (0 until 3).map { i =>
        s"""c$i AS (SELECT e.dst AS id, sum(r.rank // d.deg) AS s
           |  FROM e JOIN r$i r ON e.src = r.id JOIN deg d ON e.src = d.src
           |  GROUP BY e.dst),
           |r${i + 1} AS (SELECT nodes.id,
           |  ($base + (850000 * coalesce(c.s, 0)) // 1000000)::BIGINT AS rank
           |  FROM nodes LEFT JOIN c$i c USING (id))""".stripMargin
      }.mkString(",\n")
      s"""WITH $SqlKnnCtes,
         |e AS (SELECT src, dst FROM r WHERE rnk <= 3),
         |nodes AS (SELECT DISTINCT id FROM
         |  (SELECT src AS id FROM e UNION ALL SELECT dst AS id FROM e)),
         |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
         |nn AS (SELECT count(*) AS n FROM nodes),
         |r0 AS (SELECT id, (1000000000000 // (SELECT n FROM nn))::BIGINT AS rank FROM nodes),
         |$iterCtes
         |SELECT id, rank FROM r3 ORDER BY id""".stripMargin
    }
  )

    // north-star: exact triangle count over the kNN graph via the
    // degree-ordered node-iterator — each triangle has ONE apex under
    // the (degree, id) total order, so no /3 correction; orientation
    // bounds the wedge stage against hubs. The oracle uses the simple
    // a<b<c three-way join: orientation changes the plan, not the count.
  b.q(
    "graph_triangles" -> ((s, dir) =>
      graft.ops.graph.triangleCount(s.read.parquet(knnEdges(s, dir))))
  )
  b.o(
    "graph_triangles" ->
      s"""WITH $SqlKnnCtes,
         |ed AS (SELECT least(src, dst) AS a, greatest(src, dst) AS b
         |  FROM r WHERE rnk <= 3 GROUP BY 1, 2)
         |SELECT count(*)::BIGINT AS n_triangles
         |FROM ed e1 JOIN ed e2 ON e1.b = e2.a
         |JOIN ed e3 ON e3.a = e1.a AND e3.b = e2.b""".stripMargin
  )

    // north-star: personalized PageRank from a 5-doc seed set — the
    // expand-a-curated-set primitive: restart mass teleports to seeds,
    // so rank = multi-hop relevance, decaying with graph distance.
  b.q(
    "graph_ppr" -> ((s, dir) =>
      graft.ops.graph.personalizedPageRank(
          s.read.parquet(knnEdges(s, dir)), seeds = Seq(0L, 1L, 2L, 3L, 4L),
          iters = 3)
        .where(col("rank") > 0)
        .orderBy(col("id")))
  )
  b.o(
    "graph_ppr" -> {
      val seeds = "(0, 1, 2, 3, 4)"
      val base = "((1000000 - 850000) * 1000000000000 // 1000000) // 5"
      val iterCtes = (0 until 3).map { i =>
        s"""c$i AS (SELECT e.dst AS id, sum(r.rank // d.deg) AS s
           |  FROM e JOIN r$i r ON e.src = r.id JOIN deg d ON e.src = d.src
           |  GROUP BY e.dst),
           |r${i + 1} AS (SELECT nodes.id,
           |  ((CASE WHEN nodes.id IN $seeds THEN $base ELSE 0 END)
           |    + (850000 * coalesce(c.s, 0)) // 1000000)::BIGINT AS rank
           |  FROM nodes LEFT JOIN c$i c USING (id))""".stripMargin
      }.mkString(",\n")
      s"""WITH $SqlKnnCtes,
         |e AS (SELECT src, dst FROM r WHERE rnk <= 3),
         |nodes AS (SELECT DISTINCT id FROM
         |  (SELECT src AS id FROM e UNION ALL SELECT dst AS id FROM e)),
         |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
         |r0 AS (SELECT id, (CASE WHEN id IN $seeds
         |  THEN 1000000000000 // 5 ELSE 0 END)::BIGINT AS rank FROM nodes),
         |$iterCtes
         |SELECT id, rank FROM r3 WHERE rank > 0 ORDER BY id""".stripMargin
    }
  )

    // north-star: 3-core of the kNN graph by 4 synchronous peeling
    // rounds (fixed-round semantics, oracle unrolls the same rounds) —
    // the dense-subgraph screen: template farms live in high cores.
  b.q(
    "graph_kcore" -> ((s, dir) =>
      graft.ops.graph.kCorePeel(s.read.parquet(knnEdges(s, dir)),
          k = 3, rounds = 4)
        .orderBy(col("id")))
  )
  b.o(
    "graph_kcore" -> {
      val rounds = (1 to 4).map(i =>
        s""",
           |d$i AS (SELECT src AS id, count(*) AS d FROM u${i - 1} GROUP BY 1),
           |s$i AS (SELECT id FROM d$i WHERE d >= 3),
           |u$i AS (SELECT u.src, u.dst FROM u${i - 1} u
           |  JOIN s$i x ON u.src = x.id JOIN s$i y ON u.dst = y.id)""".stripMargin)
        .mkString
      s"""WITH $SqlKnnCtes,
         |e0 AS (SELECT least(src, dst) AS a, greatest(src, dst) AS b
         |  FROM r WHERE rnk <= 3 GROUP BY 1, 2),
         |u0 AS (SELECT a AS src, b AS dst FROM e0
         |  UNION ALL SELECT b, a FROM e0)$rounds
         |SELECT DISTINCT src AS id FROM u4 ORDER BY id""".stripMargin
    }
  )

    // deterministic synchronous label propagation over the same built
    // kNN graph — community labels travel <= iters hops; smallest-label
    // tie rule makes every round engine-reproducible.
  b.q(
    "graph_label_prop" -> ((s, dir) =>
      graft.ops.graph.labelPropagation(
          s.read.parquet(knnEdges(s, dir)), iters = 2)
        .orderBy(col("id")))
  )
    // Same undirected edges, same count-argmax with the smallest-label
    // tie rule, 2 unrolled synchronous rounds.
  b.o(
    "graph_label_prop" -> {
      val iterCtes = (0 until 2).map { i =>
        s"""c$i AS (SELECT u.src AS id, l.label, count(*) AS c
           |  FROM und u JOIN l$i l ON u.dst = l.id GROUP BY 1, 2),
           |t$i AS (SELECT id, label FROM (SELECT id, label,
           |  row_number() OVER (PARTITION BY id ORDER BY c DESC, label ASC) AS rk
           |  FROM c$i) WHERE rk = 1),
           |l${i + 1} AS (SELECT nodes.id, coalesce(t$i.label, nodes.id) AS label
           |  FROM nodes LEFT JOIN t$i USING (id))""".stripMargin
      }.mkString(",\n")
      s"""WITH $SqlKnnCtes,
         |e0 AS (SELECT src, dst FROM r WHERE rnk <= 3),
         |und AS (SELECT DISTINCT src, dst FROM
         |  (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0)),
         |nodes AS (SELECT DISTINCT src AS id FROM und),
         |l0 AS (SELECT id, id AS label FROM nodes),
         |$iterCtes
         |SELECT id, label FROM l2 ORDER BY id""".stripMargin
    }
  )

    // north-star: link prediction over the kNN graph — non-adjacent pairs
    // ranked by common-neighbor count and the fixed-point resource-
    // allocation index; the "dup cluster the pair detector missed"
    // candidate generator.
  b.q(
    "graph_linkpred" -> ((s, dir) =>
      graft.ops.graph.linkPredict(s.read.parquet(knnEdges(s, dir)))
        .orderBy(col("a"), col("b")))
  )
    // Same normalized undirected kNN edges, symmetric adjacency, fixed-
    // point resource-allocation weights (scale // deg — all integer), a
    // wedge self-join on the shared neighbor, and an anti-join against
    // the edge set. maxDeg = 1000 never trips on a k=3 kNN graph; the cap
    // is exercised by GraphSpec.
  b.o(
    "graph_linkpred" ->
      s"""WITH $SqlKnnCtes,
         |e0 AS (SELECT src, dst FROM r WHERE rnk <= 3),
         |und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
         |  FROM e0 WHERE src != dst),
         |adj AS (SELECT a AS z, b AS x FROM und
         |  UNION ALL SELECT b AS z, a AS x FROM und),
         |deg AS (SELECT z, count(*)::BIGINT AS d FROM adj GROUP BY z),
         |ak AS (SELECT adj.z, adj.x, (1000000000000 // d)::BIGINT AS w
         |  FROM adj JOIN deg USING (z) WHERE d <= 1000),
         |pr AS (SELECT l.x AS a, rt.x AS b, count(*)::BIGINT AS cn,
         |    sum(l.w)::BIGINT AS ra
         |  FROM ak l JOIN ak rt ON l.z = rt.z AND l.x < rt.x GROUP BY 1, 2)
         |SELECT a, b, cn, ra FROM pr
         |WHERE NOT EXISTS (SELECT 1 FROM und WHERE und.a = pr.a AND und.b = pr.b)
         |ORDER BY a, b""".stripMargin
  )

    // north-star: HITS hubs/authorities on the directed kNN graph with
    // deterministic integer rescaling — hub = doc whose neighborhood
    // covers the corpus, authority = doc many neighborhoods agree on.
  b.q(
    "graph_hits" -> ((s, dir) =>
      graft.ops.graph.hits(s.read.parquet(knnEdges(s, dir)), iters = 2)
        .orderBy(col("id")))
  )
    // HITS with the impl's exact half-step order (auth from hub, hub
    // from the NEW auth) and the deterministic integer rescale
    // q = 1 + (max-1) // scale, unrolled 2 iterations.
  b.o(
    "graph_hits" -> {
      def rescale(src: String, c: String): String =
        s"(SELECT id, ($c // (1 + (greatest((SELECT max($c) FROM $src), 1) - 1)" +
          s" // 1000000))::BIGINT AS $c FROM $src)"
      val iterCtes = (0 until 2).map { i =>
        s"""ar$i AS (SELECT nodes.id, coalesce(s.v, 0)::BIGINT AS auth
           |  FROM nodes LEFT JOIN (SELECT e0.dst AS id, sum(h$i.hub)::BIGINT AS v
           |    FROM e0 JOIN h$i ON e0.src = h$i.id GROUP BY 1) s USING (id)),
           |a${i + 1} AS ${rescale(s"ar$i", "auth")},
           |hr$i AS (SELECT nodes.id, coalesce(s.v, 0)::BIGINT AS hub
           |  FROM nodes LEFT JOIN (SELECT e0.src AS id, sum(a${i + 1}.auth)::BIGINT AS v
           |    FROM e0 JOIN a${i + 1} ON e0.dst = a${i + 1}.id GROUP BY 1) s USING (id)),
           |h${i + 1} AS ${rescale(s"hr$i", "hub")}""".stripMargin
      }.mkString(",\n")
      s"""WITH $SqlKnnCtes,
         |e0 AS (SELECT DISTINCT src, dst FROM r WHERE rnk <= 3),
         |nodes AS (SELECT DISTINCT id FROM
         |  (SELECT src AS id FROM e0 UNION ALL SELECT dst AS id FROM e0)),
         |h0 AS (SELECT id, 1000000::BIGINT AS hub FROM nodes),
         |$iterCtes
         |SELECT nodes.id, h2.hub, a2.auth FROM nodes
         |JOIN h2 USING (id) JOIN a2 USING (id) ORDER BY id""".stripMargin
    }
  )

    // north-star: bipartite co-occurrence projection — the co-purchase
    // graph from order->part membership, whole-basket capped, pairs
    // appearing in >= 2 baskets.
  b.q(
    "graph_bipartite" -> ((s, dir) =>
      graft.ops.graph.bipartiteProject(table(s, dir, "lineitem"),
          "l_orderkey", "l_partkey", maxBasket = 1000L, minCount = 2L)
        .orderBy(col("item_a"), col("item_b")))
  )
    // Whole-basket cap, distinct membership, one self-join on the basket.
  b.o(
    "graph_bipartite" ->
      """WITH m AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it
        |  FROM lineitem WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
        |sz AS (SELECT bk, count(*)::BIGINT AS s FROM m GROUP BY bk),
        |k AS (SELECT m.bk, m.it FROM m JOIN sz USING (bk) WHERE s <= 1000)
        |SELECT a.it AS item_a, b.it AS item_b, count(*)::BIGINT AS n_baskets
        |FROM k a JOIN k b ON a.bk = b.bk AND a.it < b.it
        |GROUP BY 1, 2 HAVING count(*) >= 2 ORDER BY 1, 2""".stripMargin
  )

    // north-star: per-node local clustering coefficient over the kNN
    // graph — exact integer basis points; a high-degree LOW-cc node is
    // a boilerplate hub stitching unrelated docs, a high-cc node sits
    // inside a genuine duplicate clique. Same degree-oriented wedge
    // plan as graph_triangles, credited to all three corners.
  b.q(
    "graph_clustering" -> ((s, dir) =>
      graft.ops.graph.clusteringCoef(s.read.parquet(knnEdges(s, dir)))
        .orderBy(col("id")))
  )
    // The simple a<b<c three-way triangle join (like graph_triangles),
    // but keeping corners: each triangle credits all three nodes.
  b.o(
    "graph_clustering" ->
      s"""WITH $SqlKnnCtes,
         |ed AS (SELECT least(src, dst) AS a, greatest(src, dst) AS b
         |  FROM r WHERE rnk <= 3 GROUP BY 1, 2),
         |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
         |  FROM ed e1 JOIN ed e2 ON e1.b = e2.a
         |  JOIN ed e3 ON e3.a = e1.a AND e3.b = e2.b),
         |tv AS (SELECT v, count(*)::BIGINT AS t FROM (
         |  SELECT x AS v FROM tri UNION ALL SELECT y FROM tri
         |  UNION ALL SELECT z FROM tri) GROUP BY 1),
         |deg AS (SELECT v, count(*)::BIGINT AS d FROM (
         |  SELECT a AS v FROM ed UNION ALL SELECT b FROM ed) GROUP BY 1)
         |SELECT deg.v AS id, d AS deg, coalesce(t, 0)::BIGINT AS n_tri,
         |  (coalesce(t, 0) * 2 * 10000 // (d * (d - 1)))::BIGINT AS cc_bp
         |FROM deg LEFT JOIN tv ON deg.v = tv.v
         |WHERE d >= 2 ORDER BY id""".stripMargin
  )

    // north-star: connected components of the 1-NN graph (each vector's
    // single nearest neighbor) — NN-chain micro-clusters, surfaced as a
    // component-size table; the CC machinery is the audited large-star/
    // small-star loop dedup clustering runs.
  b.q(
    "graph_components" -> ((s, dir) => {
      val edges = ann.knnGraph(table(s, dir, "embeddings"), k = 1, nbits = 6)
        .select(col("src").as("id_a"), col("dst").as("id_b"))
      dedup.connectedComponents(edges)
        .groupBy(col("rep").as("component"))
        .agg(count(lit(1)).as("n_nodes"))
        .orderBy(col("component"))
    })
  )
    // Transitive closure over the rnk<=1 edge set; rep = least reachable
    // id (the dedup_cluster recursive-CTE pattern on the kNN CTEs).
  b.o(
    "graph_components" ->
      s"""WITH RECURSIVE $SqlKnnCtes,
         |ed AS (SELECT least(src, dst) AS a, greatest(src, dst) AS b
         |  FROM r WHERE rnk <= 1 GROUP BY 1, 2),
         |e AS (SELECT a AS u, b AS v FROM ed UNION SELECT b, a FROM ed),
         |cl AS (SELECT u, v FROM e
         |       UNION SELECT cl.u, e.v FROM cl JOIN e ON cl.v = e.u),
         |lbl AS (SELECT u AS id, least(u, min(v)) AS rep FROM cl GROUP BY u)
         |SELECT rep AS component, count(*)::BIGINT AS n_nodes
         |FROM lbl GROUP BY 1 ORDER BY component""".stripMargin
  )

    // north-star: Newman modularity of the label-propagation partition
    // over the kNN graph — exact integer numerators (Q = Σ q_num / 4m²);
    // the did-clustering-actually-find-structure meter.
  b.q(
    "graph_modularity" -> ((s, dir) => {
      val edges = s.read.parquet(knnEdges(s, dir))
      graft.ops.graph.modularity(
          edges, graft.ops.graph.labelPropagation(edges, iters = 2))
        .orderBy(col("label"))
    })
  )
    // Label-prop l2 labels (same unrolled rounds as graph_label_prop),
    // then exact modularity numerators over the normalized undirected
    // edge set: q_num = 4·m·e_c − d_c².
  b.o(
    "graph_modularity" -> {
      val iterCtes = (0 until 2).map { i =>
        s"""c$i AS (SELECT u.src AS id, l.label, count(*) AS c
           |  FROM und u JOIN l$i l ON u.dst = l.id GROUP BY 1, 2),
           |t$i AS (SELECT id, label FROM (SELECT id, label,
           |  row_number() OVER (PARTITION BY id ORDER BY c DESC, label ASC) AS rk
           |  FROM c$i) WHERE rk = 1),
           |l${i + 1} AS (SELECT nodes.id, coalesce(t$i.label, nodes.id) AS label
           |  FROM nodes LEFT JOIN t$i USING (id))""".stripMargin
      }.mkString(",\n")
      s"""WITH $SqlKnnCtes,
         |e0 AS (SELECT src, dst FROM r WHERE rnk <= 3),
         |und AS (SELECT DISTINCT src, dst FROM
         |  (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0)),
         |nodes AS (SELECT DISTINCT src AS id FROM und),
         |l0 AS (SELECT id, id AS label FROM nodes),
         |$iterCtes,
         |u2 AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
         |  FROM e0 WHERE src != dst),
         |mm AS (SELECT count(*)::BIGINT AS m FROM u2),
         |degs AS (SELECT id, count(*)::BIGINT AS d FROM
         |  (SELECT a AS id FROM u2 UNION ALL SELECT b AS id FROM u2) GROUP BY id),
         |ei AS (SELECT la.label, count(*)::BIGINT AS e_c FROM u2
         |  JOIN l2 la ON u2.a = la.id JOIN l2 lb ON u2.b = lb.id
         |  WHERE la.label = lb.label GROUP BY 1),
         |ds AS (SELECT l2.label, count(*)::BIGINT AS n_nodes,
         |    sum(d)::BIGINT AS degree_sum
         |  FROM l2 JOIN degs USING (id) GROUP BY 1),
         |f AS (SELECT ds.label, ds.n_nodes,
         |    coalesce(ei.e_c, 0)::BIGINT AS intra_edges, ds.degree_sum,
         |    (4 * (SELECT m FROM mm) * coalesce(ei.e_c, 0)
         |      - ds.degree_sum * ds.degree_sum)::BIGINT AS q_num
         |  FROM ds LEFT JOIN ei USING (label))
         |SELECT label, n_nodes, intra_edges, degree_sum, q_num,
         |  floor(q_num::DOUBLE / (4.0 * (SELECT m FROM mm)::DOUBLE
         |    * (SELECT m FROM mm)::DOUBLE) * 10000.0 + 0.5) / 10000.0 AS q_4dp
         |FROM f ORDER BY label""".stripMargin
    }
  )

    // north-star: multi-source BFS hop rings over the symmetrized kNN
    // graph — exact integer distances, seeds as bounded literals, one
    // thin join per round.
  b.q(
    "graph_bfs" -> ((s, dir) => {
      val e = s.read.parquet(knnEdges(s, dir))
      graft.ops.graph.bfsDistances(
          e.union(e.select(col("dst").as("src"), col("src").as("dst"))),
          seeds = Seq(0L, 1L, 2L, 3L, 4L), maxHops = 3)
        .orderBy(col("id"))
    })
  )
    // Synchronous unit-weight Bellman-Ford unrolled 3 rounds over the
    // symmetrized kNN edges; distances are exact integer mins.
  b.o(
    "graph_bfs" -> {
      val rounds = (1 to 3).map(h =>
        s""",
           |d$h AS (SELECT id, min(dist)::BIGINT AS dist FROM (
           |  SELECT id, dist FROM d${h - 1}
           |  UNION ALL
           |  SELECT u.dst AS id, d.dist + 1 AS dist
           |  FROM u0 u JOIN d${h - 1} d ON u.src = d.id) GROUP BY id)""".stripMargin)
        .mkString
      s"""WITH $SqlKnnCtes,
         |e0 AS (SELECT src, dst FROM r WHERE rnk <= 3),
         |u0 AS (SELECT src, dst FROM e0
         |  UNION ALL SELECT dst, src FROM e0),
         |d0 AS (SELECT unnest([0, 1, 2, 3, 4])::BIGINT AS id, 0::BIGINT AS dist)$rounds
         |SELECT id, dist FROM d3 ORDER BY id""".stripMargin
    }
  )

    // north-star: degree assortativity of the kNN graph — hub-to-hub
    // vs hub-to-leaf wiring as one exact-moment correlation.
  b.q(
    "graph_assortativity" -> ((s, dir) =>
      graft.ops.graph.assortativity(s.read.parquet(knnEdges(s, dir))))
  )
    // Endpoint-degree Pearson over the symmetrized kNN edges — exact
    // integer moments, corrExact's quantized float at the end.
  b.o(
    "graph_assortativity" ->
      s"""WITH $SqlKnnCtes,
         |e0 AS (SELECT least(src, dst) AS a, greatest(src, dst) AS b
         |  FROM r WHERE rnk <= 3 GROUP BY 1, 2),
         |u0 AS (SELECT a AS src, b AS dst FROM e0
         |  UNION ALL SELECT b, a FROM e0),
         |deg AS (SELECT src AS id, count(*)::BIGINT AS d FROM u0 GROUP BY 1),
         |pr AS (SELECT dx.d AS x, dy.d AS y FROM u0
         |  JOIN deg dx ON u0.src = dx.id JOIN deg dy ON u0.dst = dy.id),
         |m AS (SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
         |    sum(y)::BIGINT AS sy, sum(x * y)::BIGINT AS sxy,
         |    sum(x * x)::BIGINT AS sxx, sum(y * y)::BIGINT AS syy FROM pr)
         |SELECT n,
         |  CASE WHEN n > 1 AND (n * sxx - sx * sx)::DOUBLE > 0.0
         |      AND (n * syy - sy * sy)::DOUBLE > 0.0 THEN
         |    floor((n * sxy - sx * sy)::DOUBLE
         |      / (sqrt((n * sxx - sx * sx)::DOUBLE)
         |        * sqrt((n * syy - sy * sy)::DOUBLE)) * 10000.0 + 0.5) / 10000.0
         |  END AS corr
         |FROM m""".stripMargin
  )

    // north-star: per-community structure readout over the label-prop
    // assignment — size, exact internal edges, ppm density.
  b.q(
    "graph_community_stats" -> ((s, dir) => {
      val e = s.read.parquet(knnEdges(s, dir))
      graft.ops.graph.communityStats(e,
          graft.ops.graph.labelPropagation(e, iters = 2))
        .orderBy(col("label"))
    })
  )
    // Community sizes + exact internal undirected edges + ppm density
    // over the SAME unrolled label-prop rounds as graph_label_prop.
  b.o(
    "graph_community_stats" -> {
      val iterCtes = (0 until 2).map { i =>
        s"""c$i AS (SELECT u.src AS id, l.label, count(*) AS c
           |  FROM und u JOIN l$i l ON u.dst = l.id GROUP BY 1, 2),
           |t$i AS (SELECT id, label FROM (SELECT id, label,
           |  row_number() OVER (PARTITION BY id ORDER BY c DESC, label ASC) AS rk
           |  FROM c$i) WHERE rk = 1),
           |l${i + 1} AS (SELECT nodes.id, coalesce(t$i.label, nodes.id) AS label
           |  FROM nodes LEFT JOIN t$i USING (id))""".stripMargin
      }.mkString(",\n")
      s"""WITH $SqlKnnCtes,
         |e0 AS (SELECT src, dst FROM r WHERE rnk <= 3),
         |und AS (SELECT DISTINCT src, dst FROM
         |  (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0)),
         |nodes AS (SELECT DISTINCT src AS id FROM und),
         |l0 AS (SELECT id, id AS label FROM nodes),
         |$iterCtes,
         |sizes AS (SELECT label, count(*)::BIGINT AS n_nodes FROM l2 GROUP BY 1),
         |internal AS (SELECT ls.label, (count(*) // 2)::BIGINT AS internal_edges
         |  FROM und u JOIN l2 ls ON u.src = ls.id JOIN l2 ld ON u.dst = ld.id
         |  WHERE ls.label = ld.label GROUP BY 1)
         |SELECT s.label, s.n_nodes,
         |  coalesce(i.internal_edges, 0)::BIGINT AS internal_edges,
         |  (CASE WHEN s.n_nodes > 1 THEN
         |    coalesce(i.internal_edges, 0) * 1000000
         |      // ((s.n_nodes * (s.n_nodes - 1)) // 2) END)::BIGINT AS density_ppm
         |FROM sizes s LEFT JOIN internal i USING (label)
         |ORDER BY label""".stripMargin
    }
  )
}
