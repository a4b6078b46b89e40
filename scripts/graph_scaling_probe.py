#!/usr/bin/env python
"""Scale/skew probe for the round-3 graph operators.

The sf0.1 registry graph (K1000 co-part) is dense and perfectly
regular, so it can't show the two properties the 100 TB design claims:

1. triangle_count's wedge stage is O(m^1.5) and does NOT explode on a
   celebrity hub (the round-2 id-orientation was sum(deg^2));
2. pagerank's per-iteration cost tracks edge count on the keyed-shuffle
   (non-broadcast) path, with no lineage blowup across iterations;
3. connected_components' two-phase fallback converges in O(log d)
   rounds where label propagation needs O(d).

Graphs are generated deterministically (xxhash64-derived endpoints) so
reruns are comparable. Wedge counts are reported alongside wall time —
the count is the real evidence; the wall just shows it is the dominant
stage.

Usage: python scripts/graph_scaling_probe.py [edge_counts ...]
       (default 250000 1000000 4000000)
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from quantlab_data_pipeline_spark.operators.graph import (  # noqa: E402
    _degree_oriented_edges,
    _wedges,
    connected_components,
    connected_components_two_phase,
    pagerank,
    triangle_count,
)
from quantlab_data_pipeline_spark.session import get_spark  # noqa: E402


def sparse_graph(spark, m: int, n: int):
    """~m distinct edges over n nodes, hash-uniform endpoints."""
    e = spark.range(m).select(
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(n)).alias("src"),
        F.pmod(F.xxhash64("id", F.lit(2)), F.lit(n)).alias("dst"),
    )
    return e.filter(F.col("src") != F.col("dst"))


def hub_graph(spark, m: int, n: int):
    """Same sparse graph plus ONE celebrity hub (id n//2, mid-range so
    id-orientation would have produced ~deg^2/4 wedges through it)
    connected to every node — the adversarial case for triangle
    counting."""
    hub = n // 2
    star = spark.range(n).select(
        F.lit(hub).cast("long").alias("src"), F.col("id").alias("dst")
    ).filter(F.col("dst") != hub)
    return sparse_graph(spark, m, n).unionByName(star)


def timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return out, round(time.perf_counter() - t0, 2)


def main() -> None:
    ms = [int(a) for a in sys.argv[1:]] or [250_000, 1_000_000, 4_000_000]
    spark = get_spark(app_name="graph-scaling-probe")
    spark.sparkContext.setLogLevel("ERROR")
    results = []
    for m in ms:
        n = max(1000, m // 10)  # avg degree ~20
        for kind, gen in (("sparse", sparse_graph), ("hub", hub_graph)):
            edges = gen(spark, m, n)
            oriented = _degree_oriented_edges(edges, "src", "dst").persist()
            m_eff = oriented.count()
            wedges = _wedges(oriented).count()
            _, tri_s = timed(lambda: triangle_count(edges, "src", "dst").count())
            oriented.unpersist()
            bound = int(m_eff**1.5)
            results.append(
                {
                    "graph": kind,
                    "edges": m_eff,
                    "wedges": wedges,
                    "m^1.5": bound,
                    "wedges/m^1.5": round(wedges / bound, 4),
                    "triangle_wall_s": tri_s,
                }
            )
            print(json.dumps(results[-1]))
    # PageRank: keyed-shuffle path (broadcast disabled) at the largest m
    m = ms[-1]
    n = m // 10
    e = sparse_graph(spark, m, n)
    _, pr_s = timed(
        lambda: pagerank(e, iters=10, broadcast_max_nodes=0).count()
    )
    print(json.dumps({"pagerank_10it_wall_s": pr_s, "edges": m, "nodes": n,
                      "path": "keyed-shuffle (broadcast disabled)"}))
    # CC: 100k-node chain — label propagation would need 100k rounds
    chain = spark.range(100_000 - 1).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    _, cc_s = timed(
        lambda: connected_components_two_phase(chain, max_rounds=45).count()
    )
    print(json.dumps({"cc_two_phase_100k_chain_wall_s": cc_s}))
    # and the auto path on a realistic near-dup star-cluster graph
    clusters = spark.range(100_000).select(
        (F.col("id") - F.pmod("id", F.lit(5))).alias("id_a"),
        F.col("id").alias("id_b"),
    ).filter(F.col("id_a") != F.col("id_b"))
    _, cc_auto_s = timed(lambda: connected_components(clusters).count())
    print(json.dumps({"cc_auto_star_clusters_wall_s": cc_auto_s}))


if __name__ == "__main__":
    main()
