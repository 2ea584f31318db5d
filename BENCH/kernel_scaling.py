"""Kernel-only process-scaling probe (no Spark, no shuffle, no JVM).

Measures the aggregate throughput of the raw signature kernel
(kernels.signatures_for_texts) across N independent worker processes on
disjoint slabs of one deterministic corpus. This isolates the host's
shared-DRAM ceiling from every engine-level effect: if N processes of pure
numpy stop scaling at the same knee the Spark pipeline does, the pipeline's
8->32 ratio is a hardware property of this box, not a plan defect.

Usage: python BENCH/kernel_scaling.py [procs ...]   (default 1 4 8 16 32)
Prints one JSON line: {"points": {"1": docs_per_sec, ...}, ...}
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 512
ITERS = 8


def _worker(texts, barrier, out_q) -> None:
    from pcompress_spark.config import DedupConfig
    from pcompress_spark.kernels import signatures_for_texts

    cfg = DedupConfig()
    batch = texts[:BATCH]
    signatures_for_texts(batch, cfg)  # warm caches + allocator
    barrier.wait()
    t0 = time.perf_counter()
    for i in range(ITERS):
        lo = (i * BATCH) % max(1, len(texts) - BATCH)
        signatures_for_texts(texts[lo : lo + BATCH], cfg)
    out_q.put(time.perf_counter() - t0)


def measure(n_procs: int, texts) -> float:
    barrier = mp.Barrier(n_procs)
    out_q: mp.Queue = mp.Queue()
    procs = [
        mp.Process(target=_worker, args=(texts, barrier, out_q))
        for _ in range(n_procs)
    ]
    for p in procs:
        p.start()
    walls = [out_q.get() for _ in procs]
    for p in procs:
        p.join()
    # aggregate throughput: every proc did ITERS * BATCH docs; use the
    # slowest wall (all started together at the barrier)
    return n_procs * ITERS * BATCH / max(walls)


def main() -> None:
    procs = [int(x) for x in sys.argv[1:]] or [1, 4, 8, 16, 32]
    from pcompress_spark import datagen, oracle

    data = datagen.generate(seed=7, n_conv=BATCH * (ITERS + 2), dup_frac=0.3)
    texts = oracle.assemble(data.transcripts)["doc_text"].reset_index(drop=True)
    points = {}
    for n in procs:
        points[str(n)] = round(measure(n, texts), 1)
    base = points[str(procs[0])] / procs[0]
    effs = {k: round(v / (int(k) * base), 3) for k, v in points.items()}
    print(json.dumps({"docs_per_sec": points, "efficiency_vs_first": effs,
                      "batch": BATCH, "iters": ITERS}))


if __name__ == "__main__":
    main()
