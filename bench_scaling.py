#!/usr/bin/env python
"""Two-parallelism scaling benchmark (BASELINE.md evidence).

The north rule requires throughput scaling efficiency >= 0.8 from N to 4N
executors. No real cluster exists in this sandbox, so per BASELINE.md the
evidence is the identical job at two local parallelism levels — separate
JVMs via subprocess so each run gets a clean local[N] scheduler:

    python bench_scaling.py            # runs local[8] and local[32]

Writes/updates BENCH.md with both throughputs and the efficiency.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

N_EVENTS = 1_000_000
LEVELS = [8, 32]
TRIALS = 2  # the box has noisy neighbors; min-of-trials is the robust stat

_CHILD = r"""
import json, sys, tempfile, time
from pyspark.sql import functions as F
from data_exchange_hl7_spark.session import build_session
from data_exchange_hl7_spark.datagen import change_events
from data_exchange_hl7_spark.engine import Engine
from data_exchange_hl7_spark.streaming.runner import MicroBatchRunner

cpus, n_events, wal_path, trials = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], int(sys.argv[4])
spark = build_session("scaling", master=f"local[{cpus}]")
spark.sparkContext.setLogLevel("ERROR")
# warmup: JIT + codegen caches
spark.range(0, 1_000_000, 1, 64).select(F.sha2(F.col("id").cast("string"), 256)).write.mode("overwrite").format("noop").save()
wal = spark.read.parquet(wal_path)
best, rows = None, None
for trial in range(trials):
    wh = tempfile.mkdtemp(prefix=f"dex_scale_{cpus}_")
    eng = Engine(spark, wh, n_buckets=64, mode="mor")
    table = eng.snapshot_table("repo_files")
    t0 = time.time()
    MicroBatchRunner(eng, epoch_size=n_events // 2).run(wal, table)
    dt = time.time() - t0
    rows = table.snapshot().count()
    best = dt if best is None else min(best, dt)
print(json.dumps({"cpus": cpus, "wall_s": round(best, 2),
                  "events_per_sec": round(n_events / best, 1), "rows": rows}))
"""


def main() -> None:
    repo = os.path.dirname(os.path.abspath(__file__))
    # materialize the WAL once; both runs read the same input
    gen = (
        "import sys, tempfile\n"
        "from data_exchange_hl7_spark.session import build_session\n"
        "from data_exchange_hl7_spark.datagen import change_events\n"
        "spark = build_session('gen', master='local[32]')\n"
        "spark.sparkContext.setLogLevel('ERROR')\n"
        f"change_events(spark, {N_EVENTS}).write.mode('overwrite').parquet(sys.argv[1])\n"
    )
    wal_path = os.path.join(tempfile.mkdtemp(prefix="dex_wal_"), "wal")
    subprocess.run(
        [sys.executable, "-c", gen, wal_path], cwd=repo, check=True,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )

    results = []
    for cpus in LEVELS:
        out = subprocess.run(
            [sys.executable, "-c", _CHILD, str(cpus), str(N_EVENTS), wal_path, str(TRIALS)],
            cwd=repo, check=True, capture_output=True, text=True,
        )
        res = json.loads(out.stdout.strip().splitlines()[-1])
        results.append(res)
        print(res)

    lo, hi = results[0], results[-1]
    ratio = hi["events_per_sec"] / lo["events_per_sec"]
    eff = ratio / (LEVELS[-1] / LEVELS[0])
    assert lo["rows"] == hi["rows"], "parallelism changed the result!"
    summary = {
        "n_events": N_EVENTS,
        "runs": results,
        "speedup": round(ratio, 2),
        "scaling_efficiency": round(eff, 3),
        "determinism": f"identical final row count at both levels ({lo['rows']})",
    }
    print(json.dumps(summary))

    md = [
        "# BENCH — scaling evidence (N vs 4N parallelism)",
        "",
        "North-rule criterion: throughput scaling efficiency >= 0.8 from N to 4N",
        "executors. Sandbox evidence (per BASELINE.md): identical CDC apply job",
        f"({N_EVENTS:,} events, 2 epochs, MoR mode, exactly-once manifests) on the",
        f"same parquet WAL at two local parallelism levels, separate JVMs,",
        f"min of {TRIALS} trials per level (the sandbox has noisy neighbors).",
        "",
        "| parallelism | wall (s) | events/sec |",
        "|---|---|---|",
    ]
    for r in results:
        md.append(f"| local[{r['cpus']}] | {r['wall_s']} | {r['events_per_sec']:,} |")
    md += [
        "",
        f"- speedup {LEVELS[0]}->{LEVELS[-1]} threads: **{ratio:.2f}x**",
        f"- scaling efficiency: **{eff:.3f}**"
        + (" (>= 0.8 ✓)" if eff >= 0.8 else " (< 0.8 — see notes)"),
        f"- determinism: final table row count identical at both levels ({lo['rows']}).",
        "",
        "Caveats: local[N] threads share one JVM, one memory bus and one disk, so",
        "this understates multi-node scaling (a real 4N-executor cluster adds",
        "memory bandwidth and IO in proportion). The job is dominated by",
        "hash/regex/shuffle CPU work, which is the component that scales.",
    ]
    with open(os.path.join(repo, "BENCH.md"), "w") as f:
        f.write("\n".join(md) + "\n")


if __name__ == "__main__":
    main()
