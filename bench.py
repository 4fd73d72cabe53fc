"""Benchmark harness.

Default mode: runs the headline webtext sketch-build pipeline (docs/sec) plus
every queries() pipeline over $GRAFT_SF_DIR (default /root/testdata/sf0.1)
and prints ONE JSON line:

  {"metric": "webtext_sketch_build_wall", "value": <sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., "num_cpus": N,
   "docs_per_sec": ...}

--scaling: runs the headline pipeline twice in FRESH processes at
RAY_GRAFT_CPUS=8 and =32 on the same input and reports both throughputs plus
efficiency = thr(4N) / (4 * thr(N))  (the sandbox stand-in for N-vs-4N
cluster sizes; BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
# headline corpus size scales with the sf dir (sf0.1 -> 120k docs)
WEB_ROWS = {"sf0.001": 3_000, "sf0.01": 12_000, "sf0.1": 120_000}.get(
    os.path.basename(SF_DIR.rstrip("/")), 120_000
)


def _init_ray():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    return ray


def run_headline() -> dict:
    """Webtext 4-sketch build over the cached deterministic corpus."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from epichypersketch_jl_ray.sources.webpages import webpages_dir_for

    web_dir = webpages_dir_for(WEB_ROWS, n_shards=max(16, NUM_CPUS))  # generation cached, untimed
    ray = _init_ray()
    from epichypersketch_jl_ray.pipelines.webpages import build_web_sketches, web_summary

    t0 = time.monotonic()
    state = build_web_sketches(web_dir, batch_size=4096)
    wall = time.monotonic() - t0
    summary = web_summary(state)
    return {
        "web_rows": WEB_ROWS,
        "wall_s": round(wall, 3),
        "docs_per_sec": round(WEB_ROWS / wall, 1),
        "summary": {k: (round(v, 2) if isinstance(v, float) else v) for k, v in summary.items()},
    }


def run_queries() -> dict[str, float]:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    _init_ray()
    import __ray_entry__ as entrymod

    out = {}
    for name, fn in entrymod.queries().items():
        t0 = time.monotonic()
        res = fn(SF_DIR)
        # consume to a small driver-side result so lazy pipelines execute
        if hasattr(res, "to_pandas"):
            res = res.to_pandas() if not hasattr(res, "materialize") else res.materialize()
        out[name] = round(time.monotonic() - t0, 3)
    return out


def main() -> None:
    if "--scaling" in sys.argv:
        results = {}
        for cpus in (8, 32):
            env = dict(os.environ, RAY_GRAFT_CPUS=str(cpus), GRAFT_SF_DIR=SF_DIR)
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--headline-only"],
                env=env,
                capture_output=True,
                text=True,
            )
            line = proc.stdout.strip().splitlines()[-1]
            results[cpus] = json.loads(line)
        thr8 = results[8]["docs_per_sec"]
        thr32 = results[32]["docs_per_sec"]
        print(
            json.dumps(
                {
                    "metric": "webtext_sketch_build_scaling",
                    "unit": "docs/sec",
                    "sf": SF_DIR,
                    "web_rows": results[32]["web_rows"],
                    "throughput_8cpu": thr8,
                    "throughput_32cpu": thr32,
                    "scaling_efficiency": round(thr32 / (4.0 * thr8), 3),
                }
            )
        )
        return

    headline = run_headline()
    if "--headline-only" in sys.argv:
        print(
            json.dumps(
                {
                    "metric": "webtext_sketch_build_wall",
                    "value": headline["wall_s"],
                    "unit": "sec",
                    "sf": SF_DIR,
                    "num_cpus": NUM_CPUS,
                    **headline,
                }
            )
        )
        import ray

        ray.shutdown()
        return

    queries = run_queries()
    print(
        json.dumps(
            {
                "metric": "webtext_sketch_build_wall",
                "value": headline["wall_s"],
                "unit": "sec",
                "queries": queries,
                "sf": SF_DIR,
                "num_cpus": NUM_CPUS,
                "docs_per_sec": headline["docs_per_sec"],
                "web_rows": headline["web_rows"],
                "queries_total_s": round(sum(queries.values()), 3),
                "summary": headline["summary"],
            }
        )
    )
    import ray

    ray.shutdown()


if __name__ == "__main__":
    main()
