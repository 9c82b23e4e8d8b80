"""Link-graph operators for web-corpus curation: link-graph extraction from
page text and PageRank power iteration (the classic quality prior for
training-data selection — CommonCrawl-style pipelines rank hosts by PageRank
before sampling).

Scale design (100 TB of pages → a much smaller host graph):

- ``link_graph`` is one scan of the pages table (regexp extraction is
  codegen, row-local) followed by a distinct on (src, dst) — the only
  shuffle is edge-sized, and the host graph is orders of magnitude smaller
  than the corpus.
- ``pagerank`` iterates on the |nodes|-sized rank relation. Each round is
  join(ranks, edges on src) → partial-agg sum by dst → left join back onto
  the node list: two edge-sized shuffles per round, never the corpus.
  Lineage is truncated with ``localCheckpoint`` every ``checkpoint_every``
  rounds (iterative self-referencing plans otherwise grow the logical tree
  multiplicatively — Catalyst analysis time blows up long before the data
  does).
- Dangling nodes (no out-links) simply leak their mass — documented,
  cross-engine-reproducible choice (ranks no longer sum to 1; relative
  ordering is what curation uses). Teleport handles the rest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textops import url_domains

PAGERANK_DAMPING = 0.85
PAGERANK_ITERS = 5


def link_graph(
    pages: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """Distinct (src, dst) host-level edges: the page's own host links to
    every host mentioned in its text (self-loops dropped)."""
    src = F.lower(F.regexp_extract(F.col(url_col), r"https?://([^/\s:?#]+)", 1))
    return (
        pages.select(
            src.alias("src"),
            F.explode(F.array_distinct(url_domains(text_col))).alias("dst"),
        )
        .where((F.col("dst") != F.col("src")) & (F.col("src") != ""))
        .distinct()
    )


def pagerank(
    edges: DataFrame,
    damping: float = PAGERANK_DAMPING,
    iters: int = PAGERANK_ITERS,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Power-iteration PageRank over a distinct (src, dst) edge list.

    ``rank_{t+1}(v) = (1-d)/N + d * Σ_{(u,v)∈E} rank_t(u) / outdeg(u)``,
    uniform ``1/N`` start. Returns (node, rank) after ``iters`` rounds.
    """
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    outdeg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    ew = edges.join(outdeg, "src")  # (src, dst, outdeg), reused every round
    n = nodes.count()
    teleport = F.lit((1.0 - damping) / n)

    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for i in range(iters):
        contrib = (
            ranks.join(ew, ranks["node"] == ew["src"])
            .select(F.col("dst").alias("node"), (F.col("rank") / F.col("outdeg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (teleport + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))).alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iters:
            ranks = ranks.localCheckpoint()
    return ranks


def triangle_count(edges: DataFrame) -> DataFrame:
    """Per-node triangle participation over the undirected simple graph of a
    (src, dst) edge list (direction dropped, self-loops and duplicates
    removed).

    Uses DEGREE ORIENTATION — each undirected edge points from its lower
    (degree, node) endpoint to the higher — so every triangle is enumerated
    exactly once from its lowest-degree corner, and the wedge join's
    fan-out is Σ d_out(v)² with d_out ≤ O(√m) on any graph: the bound that
    keeps the join from exploding on skewed (power-law) host graphs, where
    the naive canonical a<b orientation puts all wedges on the hubs. Two
    edge-keyed shuffles (wedge build + closing-edge semi-join); nothing
    corpus-sized.

    Output: (node, n_triangles) for nodes in ≥1 triangle.
    """
    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .union(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    da = deg.select(F.col("node").alias("a"), F.struct("deg", "node").alias("ka"))
    db = deg.select(F.col("node").alias("b"), F.struct("deg", "node").alias("kb"))
    oriented = (
        und.join(da, "a")
        .join(db, "b")
        .select(
            F.when(F.col("ka") < F.col("kb"), F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(F.col("ka") < F.col("kb"), F.col("b")).otherwise(F.col("a")).alias("v"),
            F.when(F.col("ka") < F.col("kb"), F.col("kb")).otherwise(F.col("ka")).alias("kv"),
        )
    )
    e1 = oriented.select("u", F.col("v").alias("v1"), F.col("kv").alias("k1"))
    e2 = oriented.select("u", F.col("v").alias("v2"), F.col("kv").alias("k2"))
    wedges = (
        e1.join(e2, "u")
        .where(F.col("k1") < F.col("k2"))
        .select("u", "v1", "v2")
    )
    closing = oriented.select(F.col("u").alias("v1"), F.col("v").alias("v2"))
    tris = wedges.join(closing, ["v1", "v2"])
    return (
        tris.select(F.explode(F.array("u", "v1", "v2")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("n_triangles"))
    )


def k_hop_reach(edges: DataFrame, seeds: DataFrame, k: int = 3) -> DataFrame:
    """Bounded-depth BFS: every node reachable from ``seeds`` (column
    ``node``) in at most ``k`` directed hops, with the minimum hop count.

    Frontier-style iteration: each round joins the CURRENT frontier (nodes
    first discovered last round) against the edge list, anti-joins the
    visited set, and unions. k is small and fixed (3-4 for web-graph
    neighborhood expansion), so lineage stays shallow without checkpoints.
    At scale the frontier join shuffles |frontier|+|edges| keyed by src —
    the visited set stays hop-bounded and the anti-join keeps frontiers
    shrinking; seeds are typically tiny so round 1 is a broadcast join.

    Output: (node, hops) with hops = min #edges from any seed (0 for the
    seeds themselves).
    """
    visited = seeds.select("node").distinct().withColumn("hops", F.lit(0))
    frontier = visited.select("node")
    for depth in range(1, k + 1):
        nxt = (
            frontier.join(edges, frontier["node"] == edges["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("hops", F.lit(depth))
        )
        visited = visited.unionByName(nxt)
        frontier = nxt.select("node")
    return visited


def label_propagation(
    edges: DataFrame,
    n_rounds: int = 3,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
) -> DataFrame:
    """Deterministic synchronous label-propagation communities (Raghavan
    et al. 2007, made engine-reproducible): labels start as node ids; each
    round EVERY node simultaneously takes the most frequent label among
    its neighbors, ties to the SMALLEST label, isolated-from-change nodes
    keep theirs. A fixed ``n_rounds`` (no convergence race) keeps the
    result a pure function of the graph, so a DuckDB oracle can unroll the
    rounds.

    Vs connected components: LPA splits a weakly-bridged component into
    dense cores (communities), where min-label CC would flood it to one
    id. Per round: edges ⋈ labels (one |edges| shuffle) → per-(node,
    label) counts (partial-agg) → per-node argmax window sharing the same
    node partitioning → left join onto the node list; labels are
    localCheckpoint-pinned so the iterative plan stays constant-size."""
    from pyspark.sql import Window

    sym = (
        edges.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .union(edges.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
        .repartition("dst")
        .cache()
    )
    sym.count()
    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("community"))
        .localCheckpoint()
    )
    w = Window.partitionBy("src").orderBy(F.col("n").desc(), F.col("community"))
    for _ in range(n_rounds):
        neigh = (
            sym.join(labels.withColumnRenamed("node", "dst"), "dst")
            .groupBy("src", "community")
            .agg(F.count("*").alias("n"))
        )
        top = (
            neigh.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select(F.col("src").alias("node"), F.col("community").alias("_new"))
        )
        labels = (
            labels.join(top, "node", "left")
            .select(
                "node",
                F.coalesce(F.col("_new"), F.col("community")).alias("community"),
            )
            .localCheckpoint()
        )
    return labels


def hits(
    edges: DataFrame,
    iters: int = 3,
) -> DataFrame:
    """HITS hubs/authorities (Kleinberg 1999) as a FIXED-ROUND, integer-
    exact power iteration: start from the all-ones hub vector and skip the
    per-round normalization — each round's normalizer is a global scalar,
    so unnormalized scores stay exactly proportional to normalized HITS
    while remaining exact INTEGERS (path counts), which makes the oracle
    comparison bit-trivial across engines.

    Per round: auth = per-dst sum of hubs (one edge-keyed shuffle +
    partial agg), then hub = per-src sum of auths (the second). The edge
    relation shuffles once up front and is cached; score relations are
    |nodes|-sized; localCheckpoint pins each round."""
    e = edges.select("src", "dst").distinct().cache()
    e.count()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    hub = nodes.select("node", F.lit(1).cast("long").alias("hub"))
    auth = None
    for _ in range(iters):
        auth = (
            nodes.join(
                e.join(hub.withColumnRenamed("node", "src"), "src")
                .groupBy("dst")
                .agg(F.sum("hub").alias("_a"))
                .withColumnRenamed("dst", "node"),
                "node",
                "left",
            )
            .select("node", F.coalesce(F.col("_a"), F.lit(0)).alias("auth"))
            .localCheckpoint()
        )
        hub = (
            nodes.join(
                e.join(auth.withColumnRenamed("node", "dst"), "dst")
                .groupBy("src")
                .agg(F.sum("auth").alias("_h"))
                .withColumnRenamed("src", "node"),
                "node",
                "left",
            )
            .select("node", F.coalesce(F.col("_h"), F.lit(0)).alias("hub"))
            .localCheckpoint()
        )
    return auth.join(hub, "node")


def kcore(edges: DataFrame, k: int = 3, rounds: int = 8) -> DataFrame:
    """k-core decomposition by synchronous peeling: each round drops every
    node whose CURRENT degree is below k (and the edges touching it);
    after convergence the surviving subgraph is exactly the k-core.
    ``rounds`` is fixed for cross-engine determinism (peeling is
    idempotent once converged — the fixture's fixed point is pytest-
    pinned), mirroring the unrolled-round oracle strategy of LPA/HITS.

    Scale shape: each round is one degree aggregate (edge-keyed,
    partial-agg'd) plus two semi joins restricting the edge list; edges
    shrink monotonically. Lineage is cut with ``localCheckpoint`` every
    other round (the iterative-plan rule from pagerank). Output:
    (node, degree) over the k-core subgraph.
    """
    und = (
        edges.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    cur = und
    for r in range(rounds):
        deg = (
            cur.select(F.col("a").alias("node"))
            .union(cur.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count("*").alias("deg"))
        )
        alive = deg.where(F.col("deg") >= k).select("node")
        cur = (
            cur.join(alive.withColumnRenamed("node", "a"), "a", "left_semi")
            .join(alive.withColumnRenamed("node", "b"), "b", "left_semi")
            .select("a", "b")
        )
        if (r + 1) % 2 == 0 and r + 1 < rounds:
            cur = cur.localCheckpoint()
    return (
        cur.select(F.col("a").alias("node"))
        .union(cur.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )


def sssp(
    edges: DataFrame,
    seeds: DataFrame,
    rounds: int = 4,
    weight_col: str = "w",
) -> DataFrame:
    """Single-source(-set) shortest paths, Bellman-Ford style: ``rounds``
    synchronous relaxation rounds over a weighted directed edge list
    (src, dst, w). After round r every node reachable within r hops
    carries its exact ≤-r-hop shortest distance — with integer weights the
    arithmetic is exact, so a fixed round count is cross-engine-
    deterministic and SQL-unrollable (the oracle mirrors each round as a
    min-join CTE).

    Scale shape per round: dist ⋈ edges on src (edge-keyed shuffle) →
    partial-agg min by dst → union with the carried distances → min by
    node. Nothing bigger than the frontier×out-degree relation ever
    shuffles, and the dist relation is |nodes|-bounded. Lineage cut with
    ``localCheckpoint`` every other round (the iterative-plan rule from
    pagerank).

    ``seeds``: one column ``node``; distance 0. Output: (node, dist) for
    every node reached within ``rounds`` hops.
    """
    dist = seeds.select("node", F.lit(0).cast("long").alias("dist")).distinct()
    for r in range(rounds):
        relaxed = (
            dist.join(edges.withColumnRenamed("src", "node"), "node")
            .select(
                F.col("dst").alias("node"),
                (F.col("dist") + F.col(weight_col)).cast("long").alias("dist"),
            )
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )
        if (r + 1) % 2 == 0 and r + 1 < rounds:
            dist = dist.localCheckpoint()
    return dist


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    damping: float = 0.85,
    iters: int = 3,
    ndigits: int = 6,
) -> DataFrame:
    """Personalized PageRank: teleport mass returns to the SEED set instead
    of the uniform vector — the "importance relative to these nodes" ranker
    behind related-item discovery and seed-expansion labeling.

    ``r_{t+1}(v) = (1-d)·1[v∈S]/|S| + d·Σ_{(u,v)∈E} r_t(u)/outdeg(u)``,
    starting from the teleport vector. The rank relation stays SPARSE —
    only nodes reached within t hops of a seed carry a row, so per-round
    state is frontier-sized, not graph-sized (the property that makes PPR
    tractable where global PageRank isn't worth materializing). Each round
    is one (edge ⋈ rank) join + one dst-keyed partial agg; ranks round at
    ``ndigits`` per round so an unrolled SQL oracle replays the iteration
    bit-for-bit (the logit_gd/pca_power discipline).

    Output: (node, ppr) for reached nodes after ``iters`` rounds.
    """
    outdeg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    ew = edges.join(outdeg, "src")
    scount = seeds.agg(F.count(F.lit(1)).alias("_ns"))
    tele = seeds.crossJoin(F.broadcast(scount)).select(
        "node", (F.lit(1.0 - damping) / F.col("_ns")).alias("_t")
    )
    ranks = tele.select("node", F.round(F.col("_t"), ndigits).alias("ppr"))
    for _ in range(iters):
        contrib = (
            ranks.join(ew, ranks["node"] == ew["src"])
            .select(
                F.col("dst").alias("node"),
                (F.lit(damping) * F.col("ppr") / F.col("outdeg")).alias("_c"),
            )
            .groupBy("node")
            .agg(F.sum("_c").alias("_s"))
        )
        ranks = (
            tele.join(contrib, "node", "full_outer")
            .select(
                "node",
                F.round(
                    F.coalesce(F.col("_t"), F.lit(0.0))
                    + F.coalesce(F.col("_s"), F.lit(0.0)),
                    ndigits,
                ).alias("ppr"),
            )
        )
    return ranks.where(F.col("ppr") > 0).select(
        "node", (F.col("ppr") + F.lit(0.0)).alias("ppr")
    )


def link_prediction(
    edges: DataFrame,
    k: int = 20,
    ra_scale: int = 1_000_000_000_000,
    max_center_degree: int | None = None,
) -> DataFrame:
    """Neighborhood-based link prediction over an undirected simple graph:
    score every open wedge (non-adjacent pair sharing ≥1 neighbor) by
    common-neighbor count, resource allocation (Zhou-Lü-Zhang 2009,
    Σ_z 1/deg(z)), and preferential attachment (deg·deg) — the classic
    who-should-connect-next / recommend-a-citation batch.

    Float discipline: RA is the SCALED-INTEGER ``ra_scale DIV deg(z)``
    summed as BIGINT — no float summation anywhere, bit-exact in any
    engine. CN and PA are integers natively.

    Scale shape: candidates come from ONE self-join of the adjacency on
    the wedge center (the triangle_count wedge pattern), so cost is
    Σ_z deg(z)² — quadratic only in hub degree, and for RA hubs contribute
    the LEAST (1/deg), so ``max_center_degree`` prunes them with a bounded,
    principled score loss (the standard degree-capped RA at web scale);
    left unset here so the oracle is exact. Top-k via WindowGroupLimit-
    style bounded rank on the scored pairs.

    Output: (x, y, common_neighbors, ra_score_scaled, pref_attach, rank).
    """
    from pyspark.sql.window import Window

    und = (
        edges.select("src", "dst")
        .unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    deg = und.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    centers = deg
    if max_center_degree is not None:
        centers = deg.filter(F.col("deg") <= max_center_degree)
    dz = centers.select(F.col("src").alias("z"), F.col("deg").alias("deg_z"))
    a1 = und.select(F.col("src").alias("z"), F.col("dst").alias("x"))
    a2 = und.select(F.col("src").alias("z"), F.col("dst").alias("y"))
    wedges = (
        a1.join(a2, "z")
        .filter(F.col("x") < F.col("y"))
        .join(dz, "z")  # inner: also applies the center cap when set
    )
    existing = und.filter(F.col("src") < F.col("dst")).select(
        F.col("src").alias("x"), F.col("dst").alias("y")
    )
    cand = wedges.join(existing, ["x", "y"], "left_anti")
    scored = cand.groupBy("x", "y").agg(
        F.count(F.lit(1)).alias("common_neighbors"),
        F.sum(F.expr(f"{ra_scale} DIV deg_z")).cast("long").alias("ra_score_scaled"),
    )
    dx = deg.select(F.col("src").alias("x"), F.col("deg").alias("deg_x"))
    dy = deg.select(F.col("src").alias("y"), F.col("deg").alias("deg_y"))
    out = (
        scored.join(F.broadcast(dx), "x")
        .join(F.broadcast(dy), "y")
        .select(
            "x",
            "y",
            "common_neighbors",
            "ra_score_scaled",
            (F.col("deg_x") * F.col("deg_y")).cast("long").alias("pref_attach"),
        )
    )
    order = [
        F.col("ra_score_scaled").desc(),
        F.col("common_neighbors").desc(),
        F.col("x"),
        F.col("y"),
    ]
    # TakeOrderedAndProject for the data-sized relation (per-partition
    # bounded heaps, k-row merge); the rank window then runs over ≤ k rows.
    topk = out.orderBy(*order).limit(k)
    w = Window.orderBy(*order)
    return topk.withColumn("rank", F.row_number().over(w))


def degree_assortativity(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    ndigits: int = 6,
) -> DataFrame:
    """Degree assortativity — the Pearson correlation of (deg(src),
    deg(dst)) over edges: positive = hubs link hubs (social shape),
    negative = hubs link leaves (infrastructure/bipartite catalog shape).
    The one-number summary that says whether hub-skew defenses (salting,
    star-expansion) will fire on THIS graph's joins.

    Exactness: endpoint degrees are exact counts; the five moment sums
    (Σx, Σy, Σxy, Σx², Σy²) accumulate as DECIMAL(38,0) over integer
    products (DuckDB's HUGEINT twin), and the closing Pearson form
    combines them in fixed operand order — no order-dependent float sum
    anywhere.

    Scale shape: two degree aggs (src-keyed, dst-keyed) joined back to
    the edge list on its own keys — degree relations are |nodes|-sized;
    the moment agg is one pass over edges. No windows, no self-joins.

    Output (1 row): (n_edges, n_src, n_dst, r)."""
    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
    dsrc = e.groupBy("_s").agg(F.count(F.lit(1)).alias("_dx"))
    ddst = e.groupBy("_d").agg(F.count(F.lit(1)).alias("_dy"))
    j = e.join(dsrc, "_s").join(ddst, "_d")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    acc = j.agg(
        F.count(F.lit(1)).cast("long").alias("n_edges"),
        F.sum(dec(F.col("_dx"))).alias("sx"),
        F.sum(dec(F.col("_dy"))).alias("sy"),
        F.sum(dec(F.col("_dx")) * F.col("_dy")).alias("sxy"),
        F.sum(dec(F.col("_dx")) * F.col("_dx")).alias("sxx"),
        F.sum(dec(F.col("_dy")) * F.col("_dy")).alias("syy"),
    )
    counts = dsrc.agg(F.count(F.lit(1)).cast("long").alias("n_src")).crossJoin(
        ddst.agg(F.count(F.lit(1)).cast("long").alias("n_dst"))
    )
    nn = F.col("n_edges").cast("double")
    dn = nn * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")
    dx = nn * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    dy = nn * F.col("syy") - F.col("sy").cast("double") * F.col("sy")
    r = F.when((dx <= 0.0) | (dy <= 0.0), F.lit(0.0)).otherwise(
        dn / F.sqrt(dx * dy)
    )
    return acc.crossJoin(F.broadcast(counts)).select(
        "n_edges",
        "n_src",
        "n_dst",
        (F.round(r, ndigits) + F.lit(0.0)).alias("r"),
    )


def clustering_coefficient(edges: DataFrame) -> DataFrame:
    """Local clustering coefficient per node over the undirected simple
    graph of a (src, dst) edge list: c_v = 2·T_v / (d_v·(d_v−1)) — how
    close each node's neighborhood is to a clique (the community-density
    number next to triangle_count's raw participation).

    Composition: ``triangle_count``'s degree-oriented enumeration (every
    triangle found once from its lowest-degree corner — wedge fan-out
    Σ d_out² with d_out ≤ O(√m), hub-safe) left-joined onto the degree
    relation, so triangle-free nodes report 0. Exact integers everywhere;
    the coefficient is the only float, rounded at the edge.

    Output: (node, degree, n_triangles, coeff) for nodes with degree ≥ 2
    (degree-1 nodes have no defined coefficient and are excluded).
    """
    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .union(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("degree"))
    )
    tris = triangle_count(edges)
    j = deg.join(tris, "node", "left").na.fill({"n_triangles": 0})
    d = F.col("degree").cast("double")
    coeff = 2.0 * F.col("n_triangles").cast("double") / (d * (d - 1.0))
    return j.filter(F.col("degree") >= 2).select(
        "node",
        "degree",
        F.col("n_triangles").cast("long").alias("n_triangles"),
        (F.round(coeff, 6) + F.lit(0.0)).alias("coeff"),
    )
