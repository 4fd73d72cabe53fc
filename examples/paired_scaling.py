import json, os, subprocess, sys
ARMS = []
def run_arm(cpus):
    env = dict(os.environ, RAY_GRAFT_CPUS=str(cpus), GRAFT_SF_DIR="/root/testdata/sf0.1",
               GRAFT_WEB_ROWS="960000")
    p = subprocess.run([sys.executable, "/root/repo/bench.py", "--headline-only"],
                       env=env, capture_output=True, text=True)
    return json.loads(p.stdout.strip().splitlines()[-1])["docs_per_sec"]
pairs = []
for i in range(6):
    t2 = run_arm(2)
    t8 = run_arm(8)
    pairs.append((t2, t8, round(t8 / (4 * t2), 3)))
    print(json.dumps({"pair": i, "thr_2cpu": t2, "thr_8cpu": t8, "eff": pairs[-1][2]}), flush=True)
effs = sorted(p[2] for p in pairs)
import statistics
print(json.dumps({
    "metric": "webtext_sketch_build_scaling_paired",
    "web_rows": 960000,
    "pairs": pairs,
    "median_efficiency": statistics.median(effs),
    "best_2cpu": max(p[0] for p in pairs),
    "best_8cpu": max(p[1] for p in pairs),
    "best_case_efficiency": round(max(p[1] for p in pairs) / (4 * max(p[0] for p in pairs)), 3),
}), flush=True)
