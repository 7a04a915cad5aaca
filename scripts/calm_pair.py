"""Capacity-gated scaling pair runner (round 3 protocol).

Round 2 showed the sandbox host's aggregate compute quota collapses on a
minute scale (8-worker burn throughput swings 7-30 it/s), and pairs run
during a collapse are bounded by the host, not the engine. This runner
pre-registers a gate measured BEFORE the engine runs — so the decision
to run cannot be conditioned on the engine's own result:

1. burn bracket: pinned 2-worker and 8-worker numpy sort burns
   (memory-bandwidth-heavy, same kernel as r1/r2 brackets).
2. gate: hardware-expressible efficiency (burn8/burn2/4) >= GATE_EFF
   and aggregate 8-worker throughput >= GATE_AGG it/s (quota healthy).
3. if gated in: run 4N=local[8] (taskset 0-7) then N=local[2]
   (taskset 0-1) on the identical 842k-turn corpus, then a closing
   burn bracket. 4N runs first to minimize the delay between the gate
   and the half most sensitive to a quota collapse.
4. every attempt — including gate skips — is appended to the log.

Usage: python scripts/calm_pair.py <pairs.jsonl> [--build-only]
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

GATE_EFF = float(os.environ.get("PAIR_GATE_EFF", "0.80"))
# it/s; healthy-quota floor (calm r2 windows: 15-30). Days exist where the
# quota sits uniformly ~5-10x lower while the 2->8 RATIO stays >= 0.8 — the
# ratio is what cancels in the efficiency metric, so the floor is
# overridable (PAIR_GATE_AGG) to "enough cores to finish", with the pre AND
# post ratio brackets still required for a pair to count as calm.
GATE_AGG = float(os.environ.get("PAIR_GATE_AGG", "12.0"))
# 50000 convs = 842,336 turns at seed 42 (the r2/r3-comparable corpus).
# Overridable: on days when the host quota never holds for the ~10-minute
# full-size pair, a half-size corpus (PAIR_NCONVS=25000) halves the
# exposure window so the pre AND post brackets have a chance to both hold;
# such pairs are logged with their corpus size and reported separately.
N_CONVS = int(os.environ.get("PAIR_NCONVS", "50000"))
HERE = os.path.dirname(os.path.abspath(__file__))

BURN = r"""
import multiprocessing as mp, sys, time
import numpy as np
def work(n_iter):
    a = np.random.default_rng(0).standard_normal(4_000_000)
    s = 0.0
    for _ in range(n_iter):
        s += float(np.sort(a % 1.7).sum())
    return s
if __name__ == "__main__":
    nw = int(sys.argv[1]); n_iter = int(sys.argv[2])
    t0 = time.perf_counter()
    with mp.Pool(nw) as p:
        p.map(work, [n_iter] * nw)
    print(nw * n_iter / (time.perf_counter() - t0))
"""


def burn(workers: int, cores: str, iters: int = 5) -> float:
    out = subprocess.run(
        ["taskset", "-c", cores, sys.executable, "-c", BURN, str(workers), str(iters)],
        capture_output=True,
        text=True,
        check=True,
    )
    return float(out.stdout.strip().splitlines()[-1])


# N vs 4N pairing, selectable so 4N can be chosen to FIT INSIDE the host's
# measured aggregate quota (when 4N exceeds the quota the pair measures the
# quota, not the engine — observed directly: calm-bracketed 2->8 pairs cap
# at ~0.54 on days the quota sits near ~4-5 effective cores, while the
# N=2 half's times stay normal).
LO = int(os.environ.get("PAIR_LO", "2"))
HI = 4 * LO
LO_CORES = f"0-{LO - 1}" if LO > 1 else "0"
HI_CORES = f"0-{HI - 1}"


def bracket() -> dict:
    blo = burn(LO, LO_CORES)
    bhi = burn(HI, HI_CORES)
    return {"burn_lo": round(blo, 2), "burn_hi": round(bhi, 2),
            "hw_eff": round(bhi / blo / 4.0, 3)}


def run_half(spec: str, cores: str, out_json: str, build_only: bool) -> dict:
    env = dict(os.environ)
    if build_only:
        env["SPARK_GRAFT_BUILD_ONLY"] = "1"
    subprocess.run(
        ["taskset", "-c", cores, sys.executable,
         os.path.join(HERE, "scaling_report.py"), spec, str(N_CONVS), out_json],
        env=env,
        check=True,
        capture_output=True,
        text=True,
    )
    with open(out_json) as f:
        return json.load(f)


def main() -> None:
    log_path = sys.argv[1]
    build_only = "--build-only" in sys.argv
    rec: dict = {"ts": time.strftime("%H:%M:%S"), "lo": LO, "hi": HI,
                 "n_convs": N_CONVS, "build_only": build_only,
                 "pre": bracket()}
    pre = rec["pre"]
    if pre["hw_eff"] < GATE_EFF or pre["burn_hi"] < GATE_AGG:
        rec["gate"] = "skip"
    else:
        rec["gate"] = "run"
        rhi = run_half(str(HI), HI_CORES, "/tmp/calm_pair_hi.json", build_only)
        rlo = run_half(str(LO), LO_CORES, "/tmp/calm_pair_lo.json", build_only)
        rec["post"] = bracket()
        eff = rhi["build_turns_per_sec"] / rlo["build_turns_per_sec"] / 4.0
        rec["pair"] = {
            "lo_build_sec": rlo["build_sec"],
            "hi_build_sec": rhi["build_sec"],
            "efficiency": round(eff, 3),
        }
        for k in ("query_p50_sec", "query_p95_sec", "query_total_sec",
                  "msearch_total_sec", "msearch_qps"):
            if k in rhi:
                rec["pair"]["hi_" + k] = rhi[k]
                rec["pair"]["lo_" + k] = rlo[k]
    with open(log_path, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
