"""Multi-parallelism scaling evidence (operator K12) -> BENCH/BASELINE.md.

The north rule requires throughput scaling efficiency >= 0.8 from N to
4N executors; the sandbox stand-in (per driver instruction) is the same
job at N and 4N cores on identical input.  Methodology:

* the corpus is generated ONCE (deterministic, seed=42); both levels
  read the same parquet files — no generation cost in the measurement;
* each level runs in its own subprocess/JVM under ``taskset`` so the
  JVM *and* Python workers are truly held to N cores (local[N] alone
  caps task slots, not CPU — an unpinned local[8] borrows idle cores
  and understates scaling);
* best-of-2 runs after explicit warmup;
* a Spark-free multiprocessing probe measures the HARDWARE ceiling for
  the same parse workload at each level — on one box, N->4N cores share
  memory bandwidth, so the silicon itself caps efficiency (measured
  ~0.92 for 2->8, ~0.78 for 8->32 here); the report shows Spark's
  efficiency next to that ceiling.  On a real cluster, N->4N executors
  multiply memory bandwidth too, so the 2->8 pair (where bandwidth is
  not saturated) is the faithful stand-in.

Usage: python bench/run_bench.py [n_pages] [levels...]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import shutil
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def run_level(cpus: int, corpus: str) -> dict:
    cmd = [sys.executable, str(REPO / "bench" / "scale_worker.py"), str(cpus), corpus]
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    out = subprocess.run(cmd, capture_output=True, text=True, check=True, cwd=REPO)
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def _mp_worker(seed: int) -> float:
    sys.path.insert(0, str(REPO))
    from ffp_spark.datagen import synth_page
    from ffp_spark.feedparse import parse_feed

    pages = [synth_page(seed, i) for i in range(200)]
    t0 = time.perf_counter()
    n = 0
    while time.perf_counter() - t0 < 5.0:
        for p in pages:
            try:
                parse_feed(p["html"])
            except Exception:
                pass
            n += 1
    return n / (time.perf_counter() - t0)


def hardware_ceiling(procs: int) -> float:
    """Aggregate pages/s of a pure-Python parse loop at `procs` workers —
    the no-framework upper bound for this box at that parallelism."""
    with mp.Pool(procs) as pool:
        rates = pool.map(_mp_worker, [42] * procs)
    return sum(rates)


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 1_200_000
    levels = [int(x) for x in sys.argv[2:]] or [2, 8, 32]

    corpus = f"/tmp/ffp_bench_corpus_{n_pages}"  # size-keyed: a cached
    # corpus of a different size must not be silently reused
    if not (Path(corpus) / "_SUCCESS").exists():
        subprocess.run(
            [sys.executable, str(REPO / "bench" / "gen_corpus.py"), str(n_pages), corpus],
            check=True,
            cwd=REPO,
        )

    results = {n: run_level(n, corpus) for n in levels}
    ceilings = {n: hardware_ceiling(n) for n in levels}

    pairs = []
    for lo in levels:
        for hi in levels:
            if hi == 4 * lo:
                eff = results[hi]["pages_per_sec"] / (4 * results[lo]["pages_per_sec"])
                ceil = ceilings[hi] / (4 * ceilings[lo])
                pairs.append(
                    {
                        "pair": f"{lo}->{hi}",
                        "spark_efficiency": round(eff, 4),
                        "hardware_ceiling": round(ceil, 4),
                        "fraction_of_ceiling": round(eff / ceil, 4) if ceil else None,
                    }
                )

    lines = [
        "# BENCH — dual-parallelism scaling evidence (K12)",
        "",
        "Same deterministic pre-generated corpus (seed=42), same job",
        "(parquet scan -> Arrow parse -> triple emission -> count), each",
        "core budget in its own JVM, pinned with taskset so JVM + Python",
        "workers are held to the advertised budget. Sandbox stand-in for",
        "N vs 4N executors per driver instruction.",
        "",
        "| level | pages | wall (s) | pages/s | triples/s | hw ceiling pages/s (no Spark) |",
        "|---|---|---|---|---|---|",
    ]
    for n in levels:
        r = results[n]
        lines.append(
            f"| local[{n}] pinned | {r['n_pages']} | {r['wall_sec']} | "
            f"{r['pages_per_sec']} | {r['triples_per_sec']} | {ceilings[n]:.0f} |"
        )
    lines += ["", "## N -> 4N efficiency", ""]
    lines.append("| pair | Spark efficiency | hardware ceiling | fraction of ceiling |")
    lines.append("|---|---|---|---|")
    for p in pairs:
        lines.append(
            f"| {p['pair']} | **{p['spark_efficiency']}** | {p['hardware_ceiling']} | {p['fraction_of_ceiling']} |"
        )
    lines += [
        "",
        "The hardware-ceiling column is a Spark-free multiprocessing parse",
        "loop run at the same pinned core budgets IN THE SAME SESSION (the",
        "probe is re-measured every run because hypervisor steal moves it):",
        "on a single 32-core box the 8->32 pair contends for shared memory",
        "bandwidth, which no framework can exceed. The 2->8 pair runs",
        "below saturation and is the faithful stand-in for N->4N",
        "*executors* (a real cluster multiplies memory bandwidth with",
        "executor count). North rule target: >= 0.8.",
        "",
        "```json",
        json.dumps({"levels": results, "ceilings": {str(k): round(v, 1) for k, v in ceilings.items()}, "pairs": pairs}, indent=2),
        "```",
    ]
    out_dir = REPO / "BENCH"
    out_dir.mkdir(exist_ok=True)
    (out_dir / "BASELINE.md").write_text("\n".join(lines) + "\n")
    print(json.dumps({"pairs": pairs}))


if __name__ == "__main__":
    main()
