"""Build the --py-files artifact for multi-executor spark-submit runs.

The north rule requires the pipeline to launch via
``spark-submit --py-files`` on a real cluster; this packages the pure-Python
engine (no compiled extensions, no data) into one zip that executors can
import directly:

    python tools/make_pyfiles.py [out_dir]          # -> dist/pcompress_spark.zip

    spark-submit \
        --master spark://<host>:7077 \
        --deploy-mode client \
        --py-files dist/pcompress_spark.zip \
        --conf spark.sql.adaptive.enabled=true \
        --conf spark.sql.execution.arrow.pyspark.enabled=true \
        tools/run_pipeline.py --input <transcripts> --work-dir <checkpoints>

Only ``pcompress_spark/`` goes into the zip (driver scripts stay local);
__pycache__ and caches are excluded; entries are written in sorted order
with a fixed timestamp so the artifact is byte-reproducible for a given
source tree (same spirit as the deterministic seeds everywhere else).
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "pcompress_spark"
# fixed timestamp => byte-identical zip for identical sources
_EPOCH = (1980, 1, 1, 0, 0, 0)


def build(out_dir: str | None = None) -> str:
    out_dir = out_dir or os.path.join(REPO, "dist")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, f"{PKG}.zip")
    members: list[tuple[str, str]] = []
    for root, dirs, files in os.walk(os.path.join(REPO, PKG)):
        dirs[:] = sorted(d for d in dirs if d != "__pycache__")
        for f in sorted(files):
            if not f.endswith(".py"):
                continue
            full = os.path.join(root, f)
            members.append((full, os.path.relpath(full, REPO)))
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for full, arc in members:
            with open(full, "rb") as fh:
                data = fh.read()
            info = zipfile.ZipInfo(arc, date_time=_EPOCH)
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            z.writestr(info, data)
    return out


if __name__ == "__main__":
    path = build(sys.argv[1] if len(sys.argv) > 1 else None)
    print(path)
