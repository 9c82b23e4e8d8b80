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
