"""Interleaved A/B of crawl throughput between two repo checkouts.

VERDICT r2 task 3: BENCH history shows the main-run crawl dropping
694 → 449 urls/s between rounds while the framework-free control dropped
only ~20% — not provably a regression, not provably host noise.  This
script settles it in ONE window: it alternates the identical crawl
workload (bench.py --worker <cores> crawl) between the round-1 checkout
and HEAD in an A-B-B-A ladder (so a linear host-load drift cancels), with
a control run before each pair to normalize for that minute's available
capacity.

Usage:  python tools/ab_crawl.py <repo_a> <repo_b> [cores] [pairs]
Writes BENCH/AB_CRAWL.md + appends raw rows to BENCH/ab_crawl.jsonl.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_worker(repo: str, cores: int, job: str) -> dict:
    cmd = [sys.executable, os.path.join(repo, "bench.py"), "--worker", str(cores), job]
    env = dict(os.environ)
    env.pop("SPARK_GRAFT_CPUS", None)
    proc = subprocess.run(
        cmd, capture_output=True, text=True, env=env, cwd=repo, timeout=1800
    )
    for line in proc.stdout.splitlines():
        if line.startswith("WORKER_JSON:"):
            return json.loads(line[len("WORKER_JSON:"):])
    raise RuntimeError(f"{repo} {job} worker failed: {proc.stderr[-1500:]}")


def main() -> None:
    repo_a, repo_b = sys.argv[1], sys.argv[2]
    cores = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    pairs = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    rows: list[dict] = []
    for p in range(pairs):
        order = ("a", "b") if p % 2 == 0 else ("b", "a")  # ABBA ladder
        ctl = run_worker(HERE, cores, "control")
        for side in order:
            repo = repo_a if side == "a" else repo_b
            r = run_worker(repo, cores, "crawl")
            row = {
                "ts": round(time.time(), 1),
                "pair": p,
                "side": side,
                "repo": repo,
                "cores": cores,
                "urls_per_sec": r["urls_per_sec"],
                "steady_urls_per_sec": r.get("steady_urls_per_sec"),
                "wave_wall_s": r.get("wave_wall_s"),
                "control_pages_per_sec": ctl["pages_per_sec"],
                "normalized": round(r["urls_per_sec"] / ctl["pages_per_sec"], 4),
            }
            rows.append(row)
            print(json.dumps(row), flush=True)

    a = [r for r in rows if r["side"] == "a"]
    b = [r for r in rows if r["side"] == "b"]
    med = lambda xs: round(statistics.median(xs), 1)  # noqa: E731
    summary = {
        "cores": cores,
        "pairs": pairs,
        "a_repo": repo_a,
        "b_repo": repo_b,
        "a_median_urls_per_sec": med([r["urls_per_sec"] for r in a]),
        "b_median_urls_per_sec": med([r["urls_per_sec"] for r in b]),
        "a_median_normalized": round(
            statistics.median([r["normalized"] for r in a]), 4
        ),
        "b_median_normalized": round(
            statistics.median([r["normalized"] for r in b]), 4
        ),
    }
    print(json.dumps({"ab_summary": summary}))
    os.makedirs(os.path.join(HERE, "BENCH"), exist_ok=True)
    with open(os.path.join(HERE, "BENCH", "ab_crawl.jsonl"), "a") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
        f.write(json.dumps({"ab_summary": summary}) + "\n")


if __name__ == "__main__":
    main()
