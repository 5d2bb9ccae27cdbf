package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over edge lists (the reference engine has no graph
  * surface at all — north-star extension alongside
  * [[dedup.connectedComponents]]).
  */
object graph {

  /** Deterministic PageRank in FIXED-POINT integer arithmetic: ranks are
    * longs scaled by `scale` (default 1e12), every step is integer
    * multiply / floor-divide in a fixed order, so the result is exact —
    * independent of partitioning, merge order, and engine (an independent
    * SQL engine reproduces it bit-for-bit, which is how the oracle checks
    * it). Float PageRank can't promise any of that.
    *
    * Update rule per iteration (Page et al. 1999, damping d as ppm):
    * `rank'(v) = base + d · Σ_{u→v} floor(rank(u) / outdeg(u)) / 1e6`
    * with `base = floor(floor((1e6 − d) · scale / 1e6) / n)` — dangling
    * nodes leak their mass (the standard simplification; total mass is
    * not conserved but relative ordering is what curation uses). With
    * `scale`=1e12 and d in ppm, intermediates stay ≤ ~8.5e17 for any
    * node count — no long overflow.
    *
    * Plan shape at scale: per iteration ONE join of the thin (id, rank)
    * table onto edges pre-joined with out-degrees (all keyed by src —
    * co-partitioned), one dst-keyed sum, one left join back onto the node
    * spine. Ranks are 16-byte rows; the edge table is the only big
    * operand and it is scanned, never mutated. [[ckpt.cut]] truncates
    * lineage each round (the iterative-plan discipline from
    * [[dedup.connectedComponents]] / [[bpe.train]]) so `iters` rounds
    * don't compound into one mega-plan — reliably when the session has
    * a checkpoint dir (set one on a real cluster; see [[ckpt]] for the
    * executor-loss argument), locally otherwise. Node count `n` is the
    * only driver-side scalar.
    *
    * Returns `(id, rank)` — rank in `scale` fixed-point units. */
  def pageRank(
      edges: DataFrame,
      iters: Int = 3,
      dampingPpm: Long = 850000L,
      srcCol: String = "src",
      dstCol: String = "dst",
      scale: Long = 1000000000000L): DataFrame = {
    require(iters >= 0, s"graft: pageRank needs iters >= 0, got $iters")
    require(dampingPpm >= 0 && dampingPpm <= 1000000L,
      s"graft: dampingPpm must be in [0, 1e6], got $dampingPpm")
    // Static inputs persist LAZILY: their lineage never grows, so the
    // eager materialization a checkpoint costs (one blocking job each)
    // buys nothing — only the ITERATED ranks need lineage cuts. `nodes`
    // materializes anyway via the count() below; `withDeg` on its first
    // iteration use.
    val e = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      // a null endpoint is not an edge — and a null key would silently
      // drop from the rank join while still counting in out-degrees
      .where(col("src").isNotNull && col("dst").isNotNull)
      .persist()
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct()
      .persist()
    val n = nodes.count()
    require(n > 0, "graft: pageRank needs at least one edge")
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val withDeg = e.join(outdeg, "src").persist()
    val base = ((1000000L - dampingPpm) * scale / 1000000L) / n
    var ranks = nodes.withColumn("rank", lit(scale / n))
    // Cut every 2nd round + the last (r15): a mid-loop rank table is
    // consumed exactly once by the next round, so an uncut round folds
    // into the next cut's job with no recompute — half the blocking
    // checkpoint barriers at any scale, lineage depth still ≤ 2 rounds.
    for (i <- 0 until iters) {
      val summed = withDeg
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), expr("rank DIV deg").as("c"))
        .groupBy("id").agg(sum(col("c")).as("s"))
      ranks = nodes.join(summed, Seq("id"), "left")
        .select(col("id"),
          (lit(base) +
            expr(s"($dampingPpm * coalesce(s, CAST(0 AS BIGINT))) DIV 1000000"))
            .as("rank"))
      if (i % 2 == 1 || i == iters - 1) ranks = ckpt.cut(ranks)
    }
    // The final ranks are materialized by their checkpoint, so the static
    // caches can be released — a session that PageRanks many graphs must
    // not accumulate executor storage (blocking=false: cleanup is not on
    // the caller's critical path).
    Seq(e, nodes, withDeg).foreach(_.unpersist(false))
    ranks
  }

  /** PERSONALIZED PageRank: restart mass teleports to the `seeds` only
    * (uniformly among them) instead of to every node — ranks become
    * "relevance to the seed set", the find-documents-like-these /
    * expand-a-curated-set primitive over the kNN graph (and the
    * random-walk cousin of [[graft.ops.ann.knnJoin]]'s one-hop
    * neighbors: PPR reaches multi-hop structure). Same fixed-point
    * integer arithmetic, iteration shape, and lineage discipline as
    * [[pageRank]]; the seed set rides the plan as a literal IN-set
    * (bounded — a large seed table should aggregate its mass with a
    * join variant instead). Non-seed nodes get base 0, so mass decays
    * with graph distance from the seeds. */
  def personalizedPageRank(
      edges: DataFrame,
      seeds: Seq[Long],
      iters: Int = 3,
      dampingPpm: Long = 850000L,
      srcCol: String = "src",
      dstCol: String = "dst",
      scale: Long = 1000000000000L): DataFrame = {
    require(seeds.nonEmpty && seeds.size <= 10000,
      s"graft: personalizedPageRank needs 1..10000 literal seeds, got ${seeds.size}")
    require(iters >= 0, s"graft: personalizedPageRank needs iters >= 0, got $iters")
    require(dampingPpm >= 0 && dampingPpm <= 1000000L,
      s"graft: dampingPpm must be in [0, 1e6], got $dampingPpm")
    val e = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .persist()
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct()
      .persist()
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val withDeg = e.join(outdeg, "src").persist()
    val isSeed = col("id").isin(seeds: _*)
    val base = ((1000000L - dampingPpm) * scale / 1000000L) / seeds.size
    var ranks = nodes.withColumn("rank",
      when(isSeed, lit(scale / seeds.size)).otherwise(lit(0L)))
    // same every-2nd-round cut schedule as pageRank (rationale there)
    for (i <- 0 until iters) {
      val summed = withDeg
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), expr("rank DIV deg").as("c"))
        .groupBy("id").agg(sum(col("c")).as("s"))
      ranks = nodes.join(summed, Seq("id"), "left")
        .select(col("id"),
          (when(isSeed, lit(base)).otherwise(lit(0L)) +
            expr(s"($dampingPpm * coalesce(s, CAST(0 AS BIGINT))) DIV 1000000"))
            .as("rank"))
      if (i % 2 == 1 || i == iters - 1) ranks = ckpt.cut(ranks)
    }
    Seq(e, nodes, withDeg).foreach(_.unpersist(false))
    ranks
  }

  /** Deterministic SYNCHRONOUS label propagation (Raghavan et al. 2007)
    * over an undirected view of the edge list — community detection for
    * curation: near-dup neighborhoods, topic clumps, source farms. Each
    * round every node adopts the most frequent label among its
    * neighbors, ties broken by SMALLEST label — the tie rule plus
    * synchronous (all-nodes-at-once) updates make the result a pure
    * function of the graph and `iters`: no vertex ordering, no
    * randomness, engine-reproducible (asynchronous LPA, the textbook
    * default, is order-dependent and cannot be oracle-checked).
    *
    * Converges toward [[dedup.connectedComponents]]' min-id labels on
    * dense components (a k-clique settles in 2 rounds) but does NOT
    * promise component agreement at small `iters` — that locality is
    * the feature: labels travel ≤ `iters` hops, so loosely-bridged
    * clumps keep distinct communities where CC would merge them.
    *
    * Plan shape per iteration: one join of the thin (id, label) table
    * onto the dst-keyed undirected edges, one (node, label) count with
    * map-side combine, one WindowGroupLimit argmax (bounded per-task
    * heap, same idiom as [[rel.topKPerGroup]]), one left join back onto
    * the node spine. [[ckpt.cut]] truncates lineage each round.
    * Returns `(id, label)`. */
  def labelPropagation(
      edges: DataFrame,
      iters: Int = 3,
      srcCol: String = "src",
      dstCol: String = "dst"): DataFrame = {
    require(iters >= 0, s"graft: labelPropagation needs iters >= 0, got $iters")
    val e = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
    val und = e
      .union(e.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist()
    val nodes = und.select(col("src").as("id")).distinct().persist()
    var labels = nodes.withColumn("label", col("id"))
    // every-2nd-round cut schedule (pageRank rationale): a mid-loop
    // label table is consumed once by the next round's join
    for (i <- 0 until iters) {
      val counts = und
        .join(labels.select(col("id").as("dst"), col("label").as("_nl")), "dst")
        .groupBy(col("src").as("id"), col("_nl"))
        .agg(count(lit(1)).as("_c"))
      val top = rel.topKPerGroup(counts, Seq(col("id")),
        Seq(col("_c").desc, col("_nl").asc), 1, "_rk")
      labels = nodes
        .join(top.select(col("id"), col("_nl")), Seq("id"), "left")
        .select(col("id"), coalesce(col("_nl"), col("id")).as("label"))
      if (i % 2 == 1 || i == iters - 1) labels = ckpt.cut(labels)
    }
    Seq(und, nodes).foreach(_.unpersist(false))
    labels
  }

  /** k-core membership by `rounds` SYNCHRONOUS peeling rounds: each
    * round drops every node whose degree among SURVIVORS is < k, then
    * restricts the edge set to survivors. With enough rounds this is the
    * exact k-core (each round peels at least one node until fixpoint, so
    * `rounds` ≥ peel depth converges — GraphSpec pins a planted case);
    * fixed-round semantics keep the result engine-reproducible the same
    * way [[labelPropagation]]'s fixed iterations do, and the DuckDB
    * oracle unrolls the identical rounds. The dense-subgraph screen for
    * near-dup graphs: template farms and mirror rings live in high
    * cores, organic near-dups don't.
    *
    * Plan per round: one degree aggregation + two semi-joins, all keyed
    * on node ids; [[ckpt.cut]] truncates lineage so rounds don't
    * compound. Returns the surviving `(id)` rows. */
  def kCorePeel(
      edges: DataFrame,
      k: Int,
      rounds: Int,
      srcCol: String = "src",
      dstCol: String = "dst"): DataFrame = {
    require(k >= 1 && rounds >= 0,
      s"graft: kCorePeel needs k >= 1, rounds >= 0; got $k, $rounds")
    val e0 = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull && col("src") =!= col("dst"))
    var und = e0.select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
      .select(col("a").as("src"), col("b").as("dst"))
    und = und.union(und.select(col("dst").as("src"), col("src").as("dst")))
    for (_ <- 0 until rounds) {
      val deg = und.groupBy(col("src").as("id")).agg(count(lit(1)).as("_d"))
      val surv = deg.where(col("_d") >= k).select(col("id"))
      und = und
        .join(surv.select(col("id").as("src")), "src")
        .join(surv.select(col("id").as("dst")), "dst")
        .select(col("src"), col("dst"))
      und = ckpt.cut(und)
    }
    und.select(col("src").as("id")).distinct()
  }

  /** Multi-source BFS: exact hop distance from the nearest of `seeds`
    * to every node within `maxHops`, over DIRECTED edges (symmetrize at
    * the call site for undirected semantics). The
    * how-far-is-everything-from-my-curated-set meter — [[
    * personalizedPageRank]] weights multi-hop relevance smoothly; this
    * answers the sharper "reachable in ≤ h hops?" (crawl frontiers,
    * contamination blast radius, labeling-budget rings).
    *
    * Semantics per round (synchronous Bellman-Ford on unit weights):
    * `dist'(v) = min(dist(v), min over u→v of dist(u) + 1)` — after
    * round h every node within h hops holds its exact distance; nodes
    * beyond `maxHops` don't appear. All-integer, order-free mins: the
    * result is engine-exact by construction.
    *
    * Plan shape: the [[pageRank]] iteration discipline — per round ONE
    * src-keyed join of the thin (id, dist) table onto the edge table,
    * one dst-keyed min, and a [[ckpt.cut]] lineage cut; the reached set
    * (never the graph) is the iterated state, and the seed list rides
    * the plan as a bounded literal. Returns `(id, dist)`. */
  def bfsDistances(
      edges: DataFrame,
      seeds: Seq[Long],
      maxHops: Int = 3,
      srcCol: String = "src",
      dstCol: String = "dst"): DataFrame = {
    require(seeds.nonEmpty, "graft: bfsDistances needs at least one seed")
    require(maxHops >= 0, s"graft: bfsDistances needs maxHops >= 0")
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .persist()
    var dist = seeds.distinct.toDF("id").withColumn("dist", lit(0L))
    for (_ <- 0 until maxHops) {
      val hop = e.join(dist.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), (col("dist") + 1L).as("dist"))
      dist = ckpt.cut(
        dist.union(hop).groupBy(col("id")).agg(min(col("dist")).as("dist")))
    }
    e.unpersist(false)
    dist
  }

  /** Degree assortativity (Newman 2002): the Pearson correlation of
    * endpoint degrees over the undirected edge list (each edge counted
    * in both orientations, the standard convention). Positive = hubs
    * link to hubs (social/citation shape); negative = hubs link to
    * leaves (star/crawl shape). On a kNN similarity graph a strongly
    * negative value flags hub-and-spoke template clusters the flat
    * near-dup counts miss.
    *
    * Deterministic by composition: edges normalize exactly as
    * [[kCorePeel]] (dedup, self-loops dropped, symmetrized), degrees
    * are exact counts, and the correlation is [[rel.corrExact]]'s exact
    * integer moments with its one quantized float at the end.
    *
    * Plan shape: one degree aggregation, two src/dst-keyed joins to
    * decorate the edge list, one global moment reduction. Returns one
    * row `(n, corr)` — n = directed edge count = 2·undirected. */
  def assortativity(
      edges: DataFrame,
      srcCol: String = "src",
      dstCol: String = "dst"): DataFrame = {
    val e0 = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull && col("src") =!= col("dst"))
    var und = e0.select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
      .select(col("a").as("src"), col("b").as("dst"))
    und = und.union(und.select(col("dst").as("src"), col("src").as("dst")))
    val deg = und.groupBy(col("src").as("_id")).agg(count(lit(1)).as("_deg"))
    val pairs = und
      .join(deg.select(col("_id").as("src"), col("_deg").as("_dx")), "src")
      .join(deg.select(col("_id").as("dst"), col("_deg").as("_dy")), "dst")
    rel.corrExact(pairs, "_dx", "_dy", Seq.empty, xScale = 1.0, yScale = 1.0)
  }

  /** Per-community structure readout over a `(id, label)` assignment
    * (e.g. [[labelPropagation]] output): community size, exact internal
    * undirected edge count, and density in ppm — the
    * are-these-communities-real companion to [[modularity]]'s one-number
    * partition score (a high-modularity split can still hide sparse
    * giant components; this table shows each one). Edges normalize
    * exactly as [[kCorePeel]].
    *
    * Plan shape: two label joins decorate the edge list (src-keyed,
    * dst-keyed), one label-keyed count each for nodes and internal
    * edges. All-integer; density is a positive ppm quotient
    * (`internal·10⁶ DIV (n(n−1)/2)`, null for singletons). Returns
    * `(label, n_nodes, internal_edges, density_ppm)`. */
  def communityStats(
      edges: DataFrame,
      labels: DataFrame,
      srcCol: String = "src",
      dstCol: String = "dst"): DataFrame = {
    val e0 = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull && col("src") =!= col("dst"))
    var und = e0.select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
      .select(col("a").as("src"), col("b").as("dst"))
    und = und.union(und.select(col("dst").as("src"), col("src").as("dst")))
    val lab = labels.select(col("id"), col("label"))
    val sizes = lab.groupBy(col("label")).agg(count(lit(1)).as("n_nodes"))
    val internal = und
      .join(lab.select(col("id").as("src"), col("label").as("_ls")), "src")
      .join(lab.select(col("id").as("dst"), col("label").as("_ld")), "dst")
      .where(col("_ls") === col("_ld"))
      .groupBy(col("_ls").as("label"))
      // und carries both directions, so each undirected edge counts twice
      .agg((count(lit(1)) / 2).cast("long").as("internal_edges"))
    sizes.join(internal, Seq("label"), "left")
      .select(col("label"), col("n_nodes"),
        coalesce(col("internal_edges"), lit(0L)).as("internal_edges"))
      .withColumn("density_ppm", when(col("n_nodes") > 1L,
        expr("(internal_edges * 1000000L) DIV ((n_nodes * (n_nodes - 1)) DIV 2)")))
  }

  /** Exact global triangle count via the degree-ordered node-iterator
    * (Schank & Wagner 2005 / "compact-forward"): orient every undirected
    * edge from its lower-(degree, id) endpoint to the higher one, build
    * wedges as ordered out-neighbor pairs of each apex, and close each
    * wedge against the undirected edge set. Each triangle has exactly
    * ONE apex under the total order, so the count is exact with no /3 or
    * /6 correction. The clustering meter for near-dup / kNN graphs: a
    * duplicate-heavy corpus shows up as triangle inflation long before
    * cluster extraction runs.
    *
    * Scale shape: degree orientation is what makes the wedge stage
    * survive skew — a hub of degree d contributes wedges only through
    * its LOW-degree endpoints, bounding wedge count by arboricity-style
    * Sigma outdeg^2 with outdeg = O(sqrt(m)) instead of d^2 for the hub.
    * Three shuffles total: degree count, the apex-keyed wedge self-join,
    * and the closing join against the normalized edge table. Input may
    * be directed/duplicated/self-looped; it is normalized first. */
  def triangleCount(
      edges: DataFrame,
      srcCol: String = "src",
      dstCol: String = "dst"): DataFrame = {
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .where(col("a") =!= col("b") && col("a").isNotNull && col("b").isNotNull)
      .distinct()
    val deg = und.select(explode(array(col("a"), col("b"))).as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("d"))
    // orient by (degree, id): u -> v iff (d(u), u) < (d(v), v)
    val withDeg = und
      .join(deg.select(col("v").as("a"), col("d").as("_da")), "a")
      .join(deg.select(col("v").as("b"), col("d").as("_db")), "b")
    val oriented = withDeg.select(
      when(col("_da") < col("_db") ||
          (col("_da") === col("_db") && col("a") < col("b")),
        struct(col("a").as("u"), col("b").as("v")))
        .otherwise(struct(col("b").as("u"), col("a").as("v"))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
    val o2 = oriented.select(col("u"), col("v").as("w"))
    val wedges = oriented.join(o2, "u").where(col("v") < col("w"))
      .select(least(col("v"), col("w")).as("a"),
        greatest(col("v"), col("w")).as("b"))
    wedges.join(und, Seq("a", "b"))
      .agg(count(lit(1)).as("n_triangles"))
  }

  /** Link prediction by common-neighbor evidence: for every NON-adjacent
    * pair (a, b) sharing at least one neighbor, emit the common-neighbor
    * count and the resource-allocation index (Zhou, Lü & Zhang 2009)
    * `ra = Σ_z 1/deg(z)` in fixed-point units `floor(scale / deg(z))` —
    * exact integer arithmetic, so an independent SQL engine reproduces
    * it bit-for-bit (the [[pageRank]] determinism discipline; Adamic-Adar
    * would drag in `ln`, whose last-ulp varies across engines). The
    * candidate-generation primitive for near-dup graphs: a pair with
    * heavy shared neighborhoods is a dup cluster the pairwise detector
    * missed.
    *
    * Plan shape: one wedge self-join of the symmetric adjacency keyed on
    * the shared neighbor z, one pair aggregation, one anti-join against
    * the edge set. Skew bound: a hub z of degree d contributes C(d,2)
    * wedges, so common neighbors with deg > `maxDeg` are DROPPED before
    * the self-join (the df-band discipline from dedup's gram band) —
    * principled, not just expedient: a node adjacent to everything
    * carries ~zero RA weight (1/deg ≈ 0) and no discriminative signal.
    * Dropped-hub count surfaces via `observe` metric `linkpred_hub_drop`.
    *
    * Returns `(a, b, cn, ra)`, a < b, ra in `scale` fixed-point units. */
  def linkPredict(
      edges: DataFrame,
      maxDeg: Long = 1000L,
      minCn: Long = 1L,
      srcCol: String = "src",
      dstCol: String = "dst",
      scale: Long = 1000000000000L): DataFrame = {
    require(maxDeg >= 1, s"graft: linkPredict needs maxDeg >= 1, got $maxDeg")
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .where(col("a") =!= col("b") && col("a").isNotNull && col("b").isNotNull)
      .distinct()
      .persist()
    val adj = und.select(col("a").as("z"), col("b").as("x"))
      .union(und.select(col("b").as("z"), col("a").as("x")))
    val deg = adj.groupBy("z").agg(count(lit(1)).as("_d"))
    val keep = deg
      .observe("linkpred_hub_drop",
        sum(when(col("_d") > maxDeg, 1L).otherwise(0L)).as("hubs_dropped"))
      .where(col("_d") <= maxDeg)
    val adjK = adj.join(keep, "z")
      .select(col("z"), col("x"), expr(s"CAST($scale AS BIGINT) DIV _d").as("_w"))
    val right = adjK.select(col("z"), col("x").as("y"))
    val pairs = adjK.join(right, "z").where(col("x") < col("y"))
      .groupBy(col("x").as("a"), col("y").as("b"))
      .agg(count(lit(1)).as("cn"), sum(col("_w")).as("ra"))
      .where(col("cn") >= minCn)
    val out = pairs.join(und, Seq("a", "b"), "left_anti")
    und.unpersist(false)
    out
  }

  /** HITS hubs & authorities (Kleinberg 1999) with fixed-point integer
    * arithmetic and DETERMINISTIC rescaling: after each half-step the
    * raw scores are divided by `q = ceil(max_raw / scale)` — an integer
    * quotient both engines compute identically — instead of the usual
    * float L2 normalization. Relative ordering (all HITS is used for)
    * is preserved; every intermediate stays ≤ n·scale, so with the
    * default `scale`=1e6 there is no overflow below ~9e12 nodes.
    *
    * Per iteration: two thin joins of (id, score) onto the edge table
    * (src-keyed then dst-keyed), two sums, two 1-row max aggregations
    * broadcast back via cross join (the plan stays one lazy DAG — no
    * driver collect). [[ckpt.cut]] truncates lineage each round.
    *
    * Returns `(id, hub, auth)` in `scale` fixed-point units. */
  def hits(
      edges: DataFrame,
      iters: Int = 2,
      srcCol: String = "src",
      dstCol: String = "dst",
      scale: Long = 1000000L): DataFrame = {
    require(iters >= 1, s"graft: hits needs iters >= 1, got $iters")
    val e = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .persist()
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct()
      .persist()
    def rescale(df: DataFrame, c: String): DataFrame = {
      val m = df.agg(max(col(c)).as("_m"))
      df.crossJoin(broadcast(m))
        .select(col("id"),
          // q = ceil(max/scale); greatest guards the all-zero column so the
          // (m-1) operand never goes negative (Spark DIV truncates toward
          // zero, DuckDB // floors — they only agree on non-negatives)
          expr(s"$c DIV (1 + (greatest(_m, CAST(1 AS BIGINT)) - 1)" +
            s" DIV CAST($scale AS BIGINT))").as(c))
    }
    var hub = nodes.withColumn("hub", lit(scale))
    var auth = nodes.withColumn("auth", lit(scale))
    // Per-HALF-STEP cuts are load-bearing here, unlike pageRank's
    // every-2nd-round schedule: `rescale` consumes its input TWICE
    // (the max aggregate and the main branch of the cross join), so an
    // uncut half-step recomputes its whole subtree — compounding
    // 2^depth across rounds (measured: the every-2nd schedule made
    // graph_hits 5.6 → 9.4 s while the single-consumer loops improved;
    // OPTIMIZATION_r15.md change 2).
    for (_ <- 0 until iters) {
      val aRaw = nodes
        .join(e.join(hub.select(col("id").as("src"), col("hub")), "src")
          .groupBy(col("dst").as("id")).agg(sum(col("hub")).as("auth")),
          Seq("id"), "left")
        .select(col("id"), coalesce(col("auth"), lit(0L)).as("auth"))
      auth = ckpt.cut(rescale(aRaw, "auth"))
      val hRaw = nodes
        .join(e.join(auth.select(col("id").as("dst"), col("auth")), "dst")
          .groupBy(col("src").as("id")).agg(sum(col("auth")).as("hub")),
          Seq("id"), "left")
        .select(col("id"), coalesce(col("hub"), lit(0L)).as("hub"))
      hub = ckpt.cut(rescale(hRaw, "hub"))
    }
    val out = nodes
      .join(hub, "id").join(auth, "id")
      .select(col("id"), col("hub"), col("auth"))
    Seq(e, nodes).foreach(_.unpersist(false))
    out
  }

  /** Bipartite co-occurrence projection: from (basket, item) membership
    * rows, emit item pairs that co-occur in ≥ `minCount` baskets with
    * their co-occurrence count — the co-purchase / co-citation graph
    * builder. A basket of size s contributes C(s,2) pairs, so baskets
    * larger than `maxBasket` are dropped whole before the pair stage
    * (a crawl dump or catalog-wide order would otherwise detonate it);
    * the drop count surfaces via `observe` metric
    * `bipartite_basket_drop`. Size screening happens on STREAMED counts
    * (scalar state per basket — a degenerate basket never materializes
    * its member list anywhere, which is the cap's whole point; a bare
    * `collect_set`-then-filter would buffer the hot basket before
    * dropping it). The kept rows then aggregate to sorted member
    * arrays ON the same basket-keyed exchange (zero extra shuffles —
    * size agg, anti-join probe, and set agg all consume one
    * repartition subtree) and pairs are generated IN-ROW, bounded by
    * `maxBasket` (the [[graft.ops.rel.assocRules]] shape; replacing
    * the earlier basket self-join, measured 1.6× at sf0.1).
    *
    * Returns `(item_a, item_b, n_baskets)`, item_a < item_b. */
  def bipartiteProject(
      df: DataFrame,
      basketCol: String,
      itemCol: String,
      maxBasket: Long = 1000L,
      minCount: Long = 1L): DataFrame = {
    require(maxBasket >= 2, s"graft: bipartiteProject needs maxBasket >= 2, got $maxBasket")
    // ONE basket-keyed shuffle for the whole pipeline: repartition(_bk)
    // FIRST, then dedup — HashPartitioning(_bk) satisfies the (_bk,_it)
    // clustering the dedup aggregate requires, so no second exchange, and
    // the identical repartition subtree under both consumers (size screen,
    // set aggregate) is deduped by runtime exchange reuse. The previous
    // `distinct().repartition(_bk)` form planned TWO exchanges per
    // consumer ((bk,it) dedup + bk repartition) and the optimizer pushed
    // the anti-join below one of the distincts, breaking subtree reuse —
    // the before-plan shows the membership table scanned and shuffled
    // twice (plans/r16/graph_bipartite_before.txt: 5 Exchanges, 2 scans).
    val m = df
      .select(col(basketCol).as("_bk"), col(itemCol).as("_it"))
      .where(col("_bk").isNotNull && col("_it").isNotNull)
      .repartition(col("_bk"))
      .dropDuplicates("_bk", "_it")
    val hot = m.groupBy(col("_bk"))
      .agg(count(lit(1)).as("_sz")).where(col("_sz") > maxBasket)
      .observe("bipartite_basket_drop", count(lit(1)).as("baskets_dropped"))
      .select(col("_bk"))
    val sets = m.join(broadcast(hot), Seq("_bk"), "left_anti")
      .groupBy(col("_bk"))
      .agg(sort_array(collect_set(col("_it"))).as("_is"))
    val pairCol = flatten(transform(col("_is"), (x, i) =>
      transform(slice(col("_is"), i + 2,
          greatest(size(col("_is")) - i - 1, lit(0))),
        y => struct(x.as("a"), y.as("b")))))
    sets.select(explode(pairCol).as("p"))
      .groupBy(col("p.a").as("item_a"), col("p.b").as("item_b"))
      .agg(count(lit(1)).as("n_baskets"))
      .where(col("n_baskets") >= minCount)
  }

  /** Newman modularity per community, EXACT: for community c with
    * `e_c` intra-community edges and total degree `d_c` over an
    * undirected graph of `m` edges, the contribution is
    * `e_c/m − (d_c/2m)²`; this emits the integer numerator
    * `q_num = 4·m·e_c − d_c²` (so `Q = Σ q_num / 4m²` — every term
    * exact BIGINT arithmetic, q_4dp is the one rounded float alongside).
    * The partition-quality meter for [[labelPropagation]] /
    * [[dedup.connectedComponents]] output: dup-cluster labels that
    * score near zero are no better than random grouping.
    *
    * Plan shape: edge normalization + one degree aggregation + two thin
    * label joins keyed on node ids + two small label-keyed aggregates.
    * `m` is the only driver-side scalar (the [[pageRank]] `n`
    * discipline). Overflow: `4·m·e_c ≤ 4m²` stays in BIGINT below
    * ~1.5e9 edges — beyond that, bump to DecimalType upstream.
    *
    * Returns `(label, n_nodes, intra_edges, degree_sum, q_num, q_4dp)`. */
  def modularity(
      edges: DataFrame,
      labels: DataFrame,
      srcCol: String = "src",
      dstCol: String = "dst",
      idCol: String = "id",
      labelCol: String = "label"): DataFrame = {
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .where(col("a") =!= col("b") && col("a").isNotNull && col("b").isNotNull)
      .distinct()
      .persist()
    val m = und.count()
    require(m > 0, "graft: modularity needs at least one edge")
    val deg = und.select(explode(array(col("a"), col("b"))).as("_id"))
      .groupBy("_id").agg(count(lit(1)).as("_d"))
    val lab = labels.select(col(idCol).as("_id"), col(labelCol).as("label"))
    val intra = und
      .join(lab.select(col("_id").as("a"), col("label").as("_la")), "a")
      .join(lab.select(col("_id").as("b"), col("label").as("_lb")), "b")
      .where(col("_la") === col("_lb"))
      .groupBy(col("_la").as("label"))
      .agg(count(lit(1)).as("intra_edges"))
    val out = lab.join(deg, "_id")
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_nodes"), sum(col("_d")).as("degree_sum"))
      .join(intra, Seq("label"), "left")
      .withColumn("intra_edges", coalesce(col("intra_edges"), lit(0L)))
      .select(col("label"), col("n_nodes"), col("intra_edges"), col("degree_sum"),
        (lit(4L * m) * col("intra_edges") - col("degree_sum") * col("degree_sum"))
          .as("q_num"))
      .withColumn("q_4dp",
        floor(col("q_num").cast("double") / lit(4.0 * m.toDouble * m.toDouble)
          * 10000.0 + 0.5) / 10000.0)
    und.unpersist(false)
    out
  }

  /** Per-node local clustering coefficient — how close each node's
    * neighborhood is to a clique: `cc = 2·T(v) / (d(v)·(d(v)−1))`, in
    * exact integer basis points (`10000` = every neighbor pair linked).
    * The community-density companion to [[triangleCount]]'s global
    * total: in a near-dup graph a high-cc node sits inside a tight
    * duplicate cluster, while a high-degree low-cc node is a hub
    * stitching unrelated docs (a boilerplate fingerprint, not a dup).
    *
    * Same degree-oriented wedge plan as [[triangleCount]] — each
    * triangle is found once at its (degree, id)-minimal apex, then
    * credited to all three corners by a 3-way explode + hash agg; the
    * orientation bounds wedge fan-out by O(√m) per node, so the wedge
    * stage survives hubs that would square a naive neighbor self-join.
    * Nodes of degree < 2 have no defined coefficient and are excluded
    * (their neighbor-pair set is empty).
    *
    * Returns `(id, deg, n_tri, cc_bp)`. */
  def clusteringCoef(
      edges: DataFrame,
      srcCol: String = "src",
      dstCol: String = "dst"): DataFrame = {
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .where(col("a") =!= col("b") && col("a").isNotNull && col("b").isNotNull)
      .distinct()
      .persist()
    val deg = und.select(explode(array(col("a"), col("b"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    val withDeg = und
      .join(deg.select(col("id").as("a"), col("deg").as("_da")), "a")
      .join(deg.select(col("id").as("b"), col("deg").as("_db")), "b")
    val oriented = withDeg.select(
      when(col("_da") < col("_db") ||
          (col("_da") === col("_db") && col("a") < col("b")),
        struct(col("a").as("u"), col("b").as("v")))
        .otherwise(struct(col("b").as("u"), col("a").as("v"))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
    val o2 = oriented.select(col("u"), col("v").as("w"))
    val tri = oriented.join(o2, "u").where(col("v") < col("w"))
      .select(col("u"), least(col("v"), col("w")).as("a"),
        greatest(col("v"), col("w")).as("b"))
      .join(und, Seq("a", "b"))
    val triPerNode = tri
      .select(explode(array(col("u"), col("a"), col("b"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("n_tri"))
    val out = deg.where(col("deg") >= 2)
      .join(triPerNode, Seq("id"), "left")
      .withColumn("n_tri", coalesce(col("n_tri"), lit(0L)))
      .select(col("id"), col("deg"), col("n_tri"),
        expr("(n_tri * 2 * 10000) DIV (deg * (deg - 1))").as("cc_bp"))
    und.unpersist(false)
    out
  }
}
