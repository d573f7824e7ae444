#!/usr/bin/env python
"""Transform-stage N->4N at 4 vs 16 threads — both levels below the
32-thread aggregate-memory-bandwidth collapse this box exhibits under
co-tenant load (BENCH.md round-5 investigation: multi-process copy
bandwidth peaks around 8-16 procs and COLLAPSES at 32, so an 8->32 pair
measured in a degraded window charges the bus decay to the code). The
transform stage (clean + validate + redact + minhash + sha256, no sink)
is the compute a bigger cluster actually multiplies; 4->16 measures its
parallel scaling on the resource range the host can actually provide.

Interleaved passes, separate JVMs, min-of-trials per level; appends one
JSON line (and the ambient bandwidth probes) to stdout for BENCH.md.
"""
from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

N_TRANSFORM = 1_000_000
LEVELS = [4, 16]
PASSES = 2

CHILD = r"""
import json, sys, time
from pyspark.sql import functions as F
from data_exchange_hl7_spark.session import build_session
from data_exchange_hl7_spark.operators.normalize import clean_content, redact
from data_exchange_hl7_spark.operators.validate import validate

cpus, n, twal_path = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
spark = build_session("scaling_mid", master=f"local[{cpus}]")
spark.sparkContext.setLogLevel("ERROR")
twal = spark.read.parquet(twal_path)
best = None
for trial in range(2):
    toks = F.split(F.coalesce(F.col("content"), F.lit("")), "\n")
    stage = (
        redact(validate(clean_content(twal)))
        .withColumn("sha", F.sha2(F.coalesce(F.col("content"), F.lit("")), 256))
        .withColumn("n_lines", F.size(toks))
        .withColumn(
            "mh",
            F.array_min(F.transform(toks, lambda s: F.md5(F.concat(s, F.lit(":0"))))),
        )
        .select("event_id", "status", "sha", "n_lines", "mh", "redaction_report")
    )
    t0 = time.time()
    stage.write.mode("overwrite").format("noop").save()
    dt = time.time() - t0
    best = dt if best is None else min(best, dt)
print(json.dumps({"cpus": cpus, "transform_wall_s": round(best, 2),
                  "transform_events_per_sec": round(n / best, 1)}))
"""


def main() -> None:
    repo = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, repo)
    import bench as benchmod

    twal = tempfile.mkdtemp(prefix="dex_midwal_") + "/twal"
    gen = (
        "import sys\n"
        "from data_exchange_hl7_spark.session import build_session\n"
        "from data_exchange_hl7_spark.datagen import change_events\n"
        "s = build_session('gen', master='local[32]')\n"
        "s.sparkContext.setLogLevel('ERROR')\n"
        "change_events(s, int(sys.argv[2])).write.mode('overwrite').parquet(sys.argv[1])\n"
    )
    subprocess.run(
        [sys.executable, "-c", gen, twal, str(N_TRANSFORM)], cwd=repo, check=True
    )

    probes = {"pre": benchmod._ambient_membw_gbs()}
    by_level: dict[int, list[dict]] = {c: [] for c in LEVELS}
    loadavgs: dict[int, list[float]] = {c: [] for c in LEVELS}
    for _pass in range(PASSES):
        for cpus in LEVELS:
            loadavgs[cpus].append(round(os.getloadavg()[0], 1))
            r = subprocess.run(
                [sys.executable, "-c", CHILD, str(cpus), str(N_TRANSFORM), twal],
                cwd=repo, capture_output=True, text=True, check=True,
            )
            row = json.loads(r.stdout.strip().splitlines()[-1])
            by_level[cpus].append(row)
            print(json.dumps({**row, "pass": _pass}), file=sys.stderr)
    probes["post"] = benchmod._ambient_membw_gbs()

    best = {
        c: min(rows, key=lambda r: r["transform_wall_s"]) for c, rows in by_level.items()
    }
    lo, hi = LEVELS[0], LEVELS[-1]
    ratio = best[lo]["transform_wall_s"] / best[hi]["transform_wall_s"]
    print(json.dumps({
        "n_transform": N_TRANSFORM,
        "levels": LEVELS,
        "runs": [{**best[c], "loadavgs": loadavgs[c]} for c in LEVELS],
        "transform_speedup": round(ratio, 2),
        "transform_scaling_efficiency": round(ratio / (hi / lo), 3),
        "membw_probes": probes,
    }))
    shutil.rmtree(os.path.dirname(twal), ignore_errors=True)


if __name__ == "__main__":
    main()
