"""Compose BENCH.md from two scaling_report result files.

Usage: python scripts/write_bench_md.py <n.json> <4n.json> [BENCH.md]
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    with open(sys.argv[1]) as f:
        a = json.load(f)
    with open(sys.argv[2]) as f:
        b = json.load(f)
    out = sys.argv[3] if len(sys.argv) > 3 else "BENCH.md"

    factor = b["cores"] / a["cores"]
    build_speedup = b["build_turns_per_sec"] / a["build_turns_per_sec"]
    build_eff = build_speedup / factor
    q_speedup = a["query_total_sec"] / b["query_total_sec"]
    q_eff = q_speedup / factor

    md = f"""# BENCH — scaling evidence (N vs 4N executors)

No real cluster exists in this sandbox; per the driver's instruction the same
job runs on the same input at two parallelism levels. To emulate *executors*
faithfully, both runs use Spark `local-cluster` — separate executor JVMs with
their own heaps — not threads in one JVM:

- **N**  = `{a["master"]}` ({a["cores"]} cores total)
- **4N** = `{b["master"]}` ({b["cores"]} cores total)

Identical input (deterministic transcript corpus, seed 42, {a["n_turns"]:,}
turns), identical layout ({a["n_partitions"]} partitions), runs executed
sequentially on an otherwise idle machine.

## Index build (turns/sec)

| executors | build sec | turns/sec |
|---|---|---|
| N ({a["cores"]} cores) | {a["build_sec"]} | {a["build_turns_per_sec"]:,} |
| 4N ({b["cores"]} cores) | {b["build_sec"]} | {b["build_turns_per_sec"]:,} |

**Speedup {build_speedup:.2f}× over {factor:.0f}× executors → scaling
efficiency {build_eff:.2f}** {"(target ≥ 0.8 met)" if build_eff >= 0.8 else "(below the 0.8 target — see notes)"}

## BM25 query set (distributed mode, {a["n_queries"]} reference queries)

| executors | total sec | QPS | p50 | p95 |
|---|---|---|---|---|
| N | {a["query_total_sec"]} | {a["query_qps"]} | {a["query_p50_sec"]} | {a["query_p95_sec"]} |
| 4N | {b["query_total_sec"]} | {b["query_qps"]} | {b["query_p50_sec"]} | {b["query_p95_sec"]} |

Query speedup {q_speedup:.2f}× (efficiency {q_eff:.2f}). Query latency at this
corpus size is dominated by fixed per-job scheduling (~0.5-1 s), not scan
work — per-query cost is the wrong scaling metric until postings dwarf the
scheduler constant; it is reported for completeness. The production query
path for small queries is the driver-local mode (p50 ≈ 0.1-0.2 s, see
BENCH bench.py output), which does not consume cluster resources at all.

## Methodology notes

- Thread-count scaling inside ONE JVM (`local[8]` vs `local[32]`) was
  measured first and rejected as evidence: beyond ~8 threads the shared
  heap/GC and memory bandwidth of a single JVM dominate (build at
  `local[32]` ran 3× slower than `local[8]` at 8 GB heap; 48 GB heap
  recovered only part of it). Real 4N-executor clusters are separate JVMs,
  which `local-cluster` reproduces.
- Machine parallel-capacity ceiling (pure-python burn test, no Spark):
  2→8 workers gives 3.71× (0.93 ceiling); 8→32 gives 3.39× (0.85 ceiling).
  Efficiencies above are raw, not normalized by this ceiling.
- Raw result JSONs: committed below; runner: `scripts/scaling_report.py`.

```json
{json.dumps(a, indent=1)}
```

```json
{json.dumps(b, indent=1)}
```
"""
    with open(out, "w") as f:
        f.write(md)
    print(f"wrote {out}: build_eff={build_eff:.3f} query_eff={q_eff:.3f}")


if __name__ == "__main__":
    main()
