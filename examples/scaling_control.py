"""Pure-compute control: cache-resident hashing in Ray tasks (no parquet IO,
no object-store streaming). If THIS scales ~linearly 2->8 while the
bandwidth-heavy headline does not, the headline ceiling is the machine's
memory bandwidth, not Ray orchestration."""
import json, os, subprocess, sys, time

BODY = r'''
import ray, time, numpy as np, json, sys
cpus = int(sys.argv[1])
ray.init(address="local", num_cpus=cpus, include_dashboard=False, logging_level="ERROR")

@ray.remote
def work(seed):
    x = np.arange(200_000, dtype=np.uint64) + np.uint64(seed)
    acc = np.uint64(0)
    for _ in range(120):  # ~cache-resident: 1.6MB array, repeated mixing
        x ^= x >> np.uint64(30); x *= np.uint64(0xbf58476d1ce4e5b9)
        x ^= x >> np.uint64(27); x *= np.uint64(0x94d049bb133111eb)
        x ^= x >> np.uint64(31)
        acc ^= x[0]
    return int(acc)

# warmup
ray.get([work.remote(i) for i in range(cpus)])
n_tasks = cpus * 6
t0 = time.monotonic()
ray.get([work.remote(i) for i in range(n_tasks)])
wall = time.monotonic() - t0
print(json.dumps({"cpus": cpus, "tasks_per_sec": n_tasks / wall}))
ray.shutdown()
'''
def arm(cpus):
    p = subprocess.run([sys.executable, "-c", BODY, str(cpus)], capture_output=True, text=True)
    return json.loads(p.stdout.strip().splitlines()[-1])["tasks_per_sec"]

pairs = []
for i in range(4):
    a = arm(2); b = arm(8)
    pairs.append((round(a,2), round(b,2), round(b/(4*a), 3)))
    print(json.dumps({"pair": i, "thr2": pairs[-1][0], "thr8": pairs[-1][1], "eff": pairs[-1][2]}), flush=True)
import statistics
print(json.dumps({"control_median_efficiency": statistics.median(sorted(p[2] for p in pairs)), "pairs": pairs}))
