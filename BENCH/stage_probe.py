"""Per-stage 1 -> 4 scaling decomposition.

Runs the dedup pipeline once per core count with a kept work_dir and reads
the pipeline's own metrics.json (per-stage seconds recorded by the stage
checkpointer), printing the stage-level efficiency table that backs
BENCH/BASELINE.md's analysis. One invocation = one comparable pair (see the
variance rule there).

Usage: python BENCH/stage_probe.py [n_conv] [lo_cores] [hi_cores]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = """
import json, sys, tempfile, time
sys.path.insert(0, {repo!r})
from pcompress_spark.session import get_spark
from pcompress_spark.config import DedupConfig
from pcompress_spark.pipeline import DedupPipeline
from pcompress_spark.sources.tables import transcripts_path

spark = get_spark(master="local[{cores}]", shuffle_partitions={parts})
spark.sparkContext.setLogLevel("ERROR")
tdf = spark.read.parquet(transcripts_path("/root/testdata/sf0.1", {n_conv}))
# warm python workers so worker fork/import cost is not in stage timings
import pandas as pd
def _noop(it):
    for pdf in it:
        yield pdf
spark.range(0, 10_000, 1, {parts}).mapInPandas(_noop, "id long").count()
t0 = time.monotonic()
DedupPipeline(spark, DedupConfig(), work_dir={wd!r}).run(tdf)
wall = time.monotonic() - t0
m = json.load(open({wd!r} + "/metrics.json"))
print(json.dumps({{"stages": m["stages"], "wall": round(wall, 3),
                   "finalize": m.get("finalize_seconds", {{}})}}))
"""


def probe(cores: int, n_conv: int) -> dict:
    wd = tempfile.mkdtemp(prefix=f"pcompress_stageprobe_{cores}_")
    try:
        code = _CHILD.format(repo=REPO, cores=cores, parts=max(2 * cores, 8),
                             n_conv=n_conv, wd=wd)
        out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                             text=True, timeout=3600, check=True)
        res = json.loads(out.stdout.strip().splitlines()[-1])
        return {
            "stages": {s["stage"]: s["seconds"] for s in res["stages"]},
            "construct": {s["stage"]: s.get("construct_seconds", 0.0)
                          for s in res["stages"]},
            "wall": res["wall"],
            "finalize": sum(res.get("finalize", {}).values()),
        }
    finally:
        shutil.rmtree(wd, ignore_errors=True)


def main() -> None:
    import datetime

    n_conv = int(sys.argv[1]) if len(sys.argv) > 1 else 160000
    lo = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    hi = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    a, b = probe(lo, n_conv), probe(hi, n_conv)
    lines = [
        f"| stage | local[{lo}] (s) | local[{hi}] (s) | speedup | efficiency |",
        "|---|---|---|---|---|",
    ]
    for stage, ta in a["stages"].items():
        tb = b["stages"].get(stage)
        if tb is None or tb <= 0:
            continue
        sp = ta / tb
        ca, cb = a["construct"].get(stage, 0.0), b["construct"].get(stage, 0.0)
        detail = f" (construct {ca:.1f}/{cb:.1f})" if max(ca, cb) >= 0.5 else ""
        lines.append(
            f"| {stage}{detail} | {ta:.1f} | {tb:.1f} | {sp:.2f}x | {sp / (hi / lo):.2f} |"
        )
    ta_tot, tb_tot = sum(a["stages"].values()), sum(b["stages"].values())
    lines.append(
        f"| TOTAL (stage sum) | {ta_tot:.1f} | {tb_tot:.1f} | "
        f"{ta_tot / tb_tot:.2f}x | {ta_tot / tb_tot / (hi / lo):.2f} |"
    )
    lines.append(
        f"| finalize (stats+lineage) | {a['finalize']:.1f} | {b['finalize']:.1f} | — | — |"
    )
    wa, wb = a["wall"], b["wall"]
    lines.append(
        f"| FULL run() wall | {wa:.1f} | {wb:.1f} | {wa / wb:.2f}x | "
        f"{wa / wb / (hi / lo):.2f} |"
    )
    table = "\n".join(lines)
    print(table)
    stamp = datetime.datetime.now(datetime.timezone.utc).isoformat(timespec="seconds")
    # Update ONLY this pair's section in STAGE_SCALING.md (keyed by the
    # "## Primary/Diagnostic pair" heading), preserving the other pair's
    # table and the hand-written isolation-probe narrative — a 1->4 rerun
    # must not clobber the 8->32 diagnostic evidence or vice versa.
    path = os.path.join(REPO, "BENCH", "STAGE_SCALING.md")
    heading = (
        "## Primary pair: 1 -> 4 cores (below the DRAM/oversubscription knee)"
        if (lo, hi) == (1, 4)
        else f"## Pair: {lo} -> {hi} cores"
    )
    section = f"{heading}\n\n{table}\n\nGenerated {stamp} by BENCH/stage_probe.py.\n"
    try:
        with open(path) as f:
            doc = f.read()
    except OSError:
        doc = ""
    if heading in doc:
        head, rest = doc.split(heading, 1)
        nxt = rest.find("\n## ")
        tail = rest[nxt + 1:] if nxt >= 0 else ""
        doc = head + section + ("\n" + tail if tail else "")
    else:
        doc = (doc.rstrip() + "\n\n" if doc.strip() else "") + section
    with open(path, "w") as f:
        f.write(doc)


if __name__ == "__main__":
    main()
