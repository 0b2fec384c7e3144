"""Scale stress for the graph operators (round 3 evidence).

Deterministic synthetic edge lists built JVM-side from F.sequence +
xxhash64 (no driver-side data, no wall clock / unseeded randomness):

* pagerank (unweighted AND weighted): 10M-edge two-tier graph (10% of
  edges land on a 1k-node hot set over 1M nodes — hub skew like a web
  graph), 5 iterations.
* triangle_count: 2M-edge graph over 100k nodes (avg degree 40, hot
  set included) — exercises the degree-ordered orientation under skew.
* bfs_depths, two shapes: hub graph (10M edges, 8 rounds — frontier
  explodes, stresses the per-level join + anti-join at volume) and a
  1M-node chain (16 rounds, frontier of ONE — stresses per-round fixed
  overhead, the worst case for any iterative operator).
* kcore_edges: 2M-edge graph, k=10, 6 peeling rounds.
* label_propagation: 2M-edge graph, 3 rounds.

Round-5 additions (section "r5"): neighborhood_hll (HyperBall — the
register explosion is the stress: E_directed x 64 rows shuffle per
round), link_prediction with the hub-degree cap (wedge fan-out under
skew), modularity over the LPA labels.

Round-5 continuation (section "r5b"): ktruss_edges (per-round triangle
re-enumeration is the stress — 3 peels = 3 oriented wedge joins over
the surviving edge set) and scc (directed graph, two run-to-convergence
min-label propagations per outer round; the skewed graph's giant SCC
settles in round 1, the tail in round 2).

Usage:  python bench/graph_stress.py [n_edges_pr] [n_edges_tri] [cpus] [section]
section: all (default) | base | r5 | r5b.  Prints one JSON line with
walls and result fingerprints.  Pin with taskset -c 0-(cpus-1) for
scaling claims (local[N] caps task slots, not CPU).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402


def make_edges(spark, n_edges: int, n_nodes: int, hot_nodes: int, hot_pct: int):
    """Deterministic skewed edge list: edge i = (h(i) mod V, dst) where
    dst lands in a small hot set for hot_pct% of edges."""
    base = spark.range(n_edges)
    h1 = F.abs(F.xxhash64(F.col("id"), F.lit(1)))
    h2 = F.abs(F.xxhash64(F.col("id"), F.lit(2)))
    hot = F.abs(F.xxhash64(F.col("id"), F.lit(3)))
    dst = F.when(h2 % 100 < hot_pct, hot % hot_nodes).otherwise(h2 % n_nodes)
    return base.select(
        F.concat(F.lit("n"), (h1 % n_nodes).cast("string")).alias("src"),
        F.concat(F.lit("n"), dst.cast("string")).alias("dst"),
    ).where(F.col("src") != F.col("dst"))


def main() -> None:
    n_pr = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_tri = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    section = sys.argv[4] if len(sys.argv) > 4 else "all"

    from ffp_spark.graph import (
        bfs_depths,
        kcore_edges,
        label_propagation,
        pagerank,
        triangle_count,
    )
    from ffp_spark.pipeline import build_session

    spark = build_session(
        "graph-stress", master=f"local[{cpus}]", shuffle_partitions=max(32, cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"metric": "graph_stress", "unit": "sec", "cpus": cpus}

    if section in ("all", "r5"):
        from ffp_spark.graph import (
            harmonic_centrality,
            label_propagation as _lpa_r5,
            link_prediction,
            modularity,
            neighborhood_function,
            neighborhood_hll,
        )

        e5 = make_edges(
            spark, n_tri, n_nodes=100_000, hot_nodes=1_000, hot_pct=10
        ).localCheckpoint(eager=True)

        # HyperBall: the stress IS the register explosion — every round
        # shuffles E_directed x 64 (node, bucket, rho) rows into a
        # partial-aggregated max
        t0 = time.perf_counter()
        nh = neighborhood_hll(e5, radius=2)
        agg = nh.agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("hll_est") * 100).cast("long")).alias("est_q"),
        ).collect()[0]
        out["hyperball_sec"] = round(time.perf_counter() - t0, 2)
        out["hyperball_nodes"] = int(agg["n"])
        out["hyperball_est_fingerprint"] = int(agg["est_q"])

        # link prediction with the hub cap (the configuration a skewed
        # web graph runs): wedge fan-out bounded by cap^2 per center
        t0 = time.perf_counter()
        lp = link_prediction(e5, top_k=100, max_common_degree=128)
        lp_rows = lp.collect()
        out["linkpred_sec"] = round(time.perf_counter() - t0, 2)
        out["linkpred_top_cn"] = int(lp_rows[0].common_neighbors)
        out["linkpred_fingerprint"] = sum(
            int(r.aa_score_q) for r in lp_rows
        )

        # harmonic centrality rides the same propagation plus one
        # V*64-row partial agg per round — the delta vs hyperball_sec
        # is the price of the per-radius estimates
        t0 = time.perf_counter()
        hcagg = (
            harmonic_centrality(e5, radius=2)
            .agg(F.count("*").alias("n"), F.sum("hc_q").alias("s"))
            .collect()[0]
        )
        out["harmonic_sec"] = round(time.perf_counter() - t0, 2)
        out["harmonic_nodes"] = int(hcagg["n"])
        out["harmonic_fingerprint"] = int(hcagg["s"])

        # neighborhood function at radius 3: one MORE propagation round
        # than the hyperball/harmonic rows (the marginal round is the
        # scale cost that matters), reduced to one scalar per radius
        t0 = time.perf_counter()
        nf_rows = {
            int(r.radius): int(r.nf_q)
            for r in neighborhood_function(e5, max_radius=3).collect()
        }
        out["nfunc_sec"] = round(time.perf_counter() - t0, 2)
        out["nfunc_fingerprint"] = nf_rows[3]
        out["nfunc_curve"] = [nf_rows[r] for r in sorted(nf_rows)]

        t0 = time.perf_counter()
        mod = modularity(e5, _lpa_r5(e5, rounds=3)).collect()[0]
        out["modularity_sec"] = round(time.perf_counter() - t0, 2)
        out["modularity_q_num"] = int(mod.q_num)
        out["modularity_communities"] = int(mod.n_communities)

    if section == "r5":
        print(json.dumps(out))
        spark.stop()
        return

    if section in ("all", "r5b"):
        from ffp_spark.graph import ktruss_edges, scc

        e5b = make_edges(
            spark, n_tri, n_nodes=100_000, hot_nodes=1_000, hot_pct=10
        ).localCheckpoint(eager=True)

        # k-truss: 3 peel rounds, each re-running the oriented triangle
        # enumeration on the surviving edges — the per-round wedge join
        # is the whole cost.  A uniform random digraph's truss peels to
        # EMPTY (too few overlapping triangles), so plant a 300-node
        # clique: the stress is the real use case — extract the dense
        # community from 2M edges of noise, fingerprint = the planted
        # clique's edge set surviving exactly
        n_cl = 300
        cl = spark.range(n_cl).select(F.col("id").alias("i")).crossJoin(
            spark.range(n_cl).select(F.col("id").alias("j"))
        ).where(F.col("i") < F.col("j")).select(
            F.concat(F.lit("n"), F.col("i").cast("string")).alias("src"),
            F.concat(F.lit("n"), F.col("j").cast("string")).alias("dst"),
        )
        e_tr = e5b.unionByName(cl).localCheckpoint(eager=True)
        t0 = time.perf_counter()
        truss = ktruss_edges(e_tr, k=10, rounds=3)
        n_truss = truss.count()
        fp = truss.agg(
            F.coalesce(
                F.sum(F.xxhash64("a", "b").cast("decimal(38,0)")), F.lit(0)
            )
        ).collect()[0][0]
        out["ktruss_sec"] = round(time.perf_counter() - t0, 2)
        out["ktruss_edges_out"] = int(n_truss)
        out["ktruss_fingerprint"] = int(fp)

        # SCC on the DIRECTED skewed graph (edges as generated, no
        # symmetrization): the hot set pulls almost everything into one
        # giant component that settles in outer round 1
        t0 = time.perf_counter()
        comp = scc(e5b)
        sizes = comp.groupBy("scc_id").agg(F.count("*").alias("sz"))
        top = sizes.orderBy(F.desc("sz"), "scc_id").limit(1).collect()[0]
        out["scc_sec"] = round(time.perf_counter() - t0, 2)
        out["scc_n_components"] = sizes.count()
        out["scc_biggest"] = int(top.sz)

    if section == "r5b":
        print(json.dumps(out))
        spark.stop()
        return

    e_pr = make_edges(spark, n_pr, n_nodes=1_000_000, hot_nodes=1_000, hot_pct=10)
    t0 = time.perf_counter()
    scores = pagerank(e_pr, iters=5)
    top = scores.orderBy(F.desc("pr_q"), "node").limit(5).collect()
    out["pagerank_sec"] = round(time.perf_counter() - t0, 2)
    out["pagerank_edges"] = n_pr
    out["pagerank_top_q"] = int(top[0].pr_q)
    out["pagerank_mass"] = int(scores.agg(F.sum("pr_q")).collect()[0][0])

    # weighted PageRank on the same graph (w in 1..8; per-edge division
    # happens in the edge-join projection — same shuffle shape)
    e_prw = e_pr.withColumn(
        "w", (F.abs(F.xxhash64("src", "dst", F.lit(4))) % 8 + 1).cast("long")
    )
    t0 = time.perf_counter()
    scores_w = pagerank(e_prw, iters=5, weight="w")
    top_w = scores_w.orderBy(F.desc("pr_q"), "node").limit(5).collect()
    out["pagerank_weighted_sec"] = round(time.perf_counter() - t0, 2)
    out["pagerank_weighted_top_q"] = int(top_w[0].pr_q)

    # BFS shape 1: hub graph — frontier explodes to ~everything in a
    # few levels; stresses the E-sized join + V-sized anti-join
    sources = spark.createDataFrame([("n0",)], "node string")
    t0 = time.perf_counter()
    depths = bfs_depths(e_pr, sources, max_depth=8)
    hub_hist = {int(r.depth): int(r.n) for r in depths.groupBy("depth").agg(
        F.count("*").alias("n")).collect()}
    out["bfs_hub_sec"] = round(time.perf_counter() - t0, 2)
    out["bfs_hub_reached"] = sum(hub_hist.values())

    # BFS shape 2: 1M-node chain, frontier of ONE per level — measures
    # the per-round fixed cost (job barrier + checkpoint), the honest
    # worst case for iterative frontier expansion
    chain = spark.range(1_000_000 - 1).select(
        F.concat(F.lit("c"), F.col("id").cast("string")).alias("src"),
        F.concat(F.lit("c"), (F.col("id") + 1).cast("string")).alias("dst"),
    )
    c_src = spark.createDataFrame([("c0",)], "node string")
    t0 = time.perf_counter()
    c_depths = bfs_depths(chain, c_src, max_depth=16)
    out["bfs_chain_reached"] = c_depths.count()
    out["bfs_chain_sec"] = round(time.perf_counter() - t0, 2)

    e_tri = make_edges(spark, n_tri, n_nodes=100_000, hot_nodes=1_000, hot_pct=10)
    t0 = time.perf_counter()
    row = triangle_count(e_tri).collect()[0]
    out["triangles_sec"] = round(time.perf_counter() - t0, 2)
    out["triangles_edges_in"] = n_tri
    out["n_triangles"] = int(row.n_triangles)
    out["tri_nodes"] = int(row.n_nodes)
    out["tri_edges"] = int(row.n_edges)

    t0 = time.perf_counter()
    core = kcore_edges(e_tri, k=10, rounds=6)
    out["kcore_edges_out"] = core.count()
    out["kcore_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    comm = label_propagation(e_tri, rounds=3)
    out["lpa_communities"] = comm.select("label").distinct().count()
    out["lpa_sec"] = round(time.perf_counter() - t0, 2)

    # round-4 operators, same 10M-edge skewed graph where applicable
    from ffp_spark.graph import deterministic_walks, hits, sssp

    t0 = time.perf_counter()
    ha = hits(e_pr, iters=3)
    top_a = ha.orderBy(F.desc("auth_q"), F.desc("hub_q"), "node").limit(5).collect()
    out["hits_sec"] = round(time.perf_counter() - t0, 2)
    out["hits_top_auth_q"] = int(top_a[0].auth_q)

    e_w = e_pr.withColumn(
        "w", (F.abs(F.xxhash64("src", "dst", F.lit(5))) % 8 + 1).cast("long")
    )
    t0 = time.perf_counter()
    d = sssp(e_w, sources, rounds=6)
    out["sssp_reached"] = d.count()
    out["sssp_sec"] = round(time.perf_counter() - t0, 2)

    # 100k concurrent walks of length 4: walk state is |starts|-sized,
    # each step joins the frontier against the cached 10M-edge set
    walk_starts = spark.range(100_000).select(
        F.concat(F.lit("n"), F.col("id").cast("string")).alias("node")
    )
    t0 = time.perf_counter()
    walks = deterministic_walks(e_pr, walk_starts, walk_len=4)
    out["walks_n"] = walks.count()
    out["walks_sec"] = round(time.perf_counter() - t0, 2)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
