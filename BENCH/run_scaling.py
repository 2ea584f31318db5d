"""Scaling-efficiency evidence (sandbox substitute for N -> 4N executors).

Primary measurement: local[N] vs local[4N] (default N=1 -> 4N=4 cores) on
the SAME deterministic input — both points must sit below this box's
shared-memory-bandwidth saturation, which is the honest single-machine
stand-in for adding EXECUTORS (each real executor brings its own memory
bandwidth; CPU threads on one box share it). The signature kernels measure
bandwidth-bound from ~8 threads up on this VM, so the unsaturated primary
pair is 1 -> 4.

Supplementary: local[8] vs local[32] at a larger corpus, reported together
with the measured bandwidth ceiling so the number is interpretable (a
hardware ceiling, not a Spark artifact).

Each point is best-of-SPARK_GRAFT_BENCH_RUNS (default 2) pipeline runs in
one warmed session (bench.py), so page-cache/GC variance doesn't pollute
the ratio.

Usage: python BENCH/run_scaling.py [n_conv_primary] [n_conv_supp] [N]
"""

from __future__ import annotations

import datetime
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(cpus: int, n_conv: int, pipeline_only: bool = False,
              extra_env: dict | None = None) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["SPARK_GRAFT_BENCH_CONVS"] = str(n_conv)
    if pipeline_only:
        # the 1->4 pair needs only the pipeline point; the full query
        # suite + KMV channel cost more than the pipeline at local[1]
        env["SPARK_GRAFT_BENCH_PIPELINE_ONLY"] = "1"
    if extra_env:
        env.update(extra_env)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=7200,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def kernel_ceiling() -> dict:
    """Spark-free multi-process kernel throughput (BENCH/kernel_scaling.py)
    measured in THIS invocation — the host's compute/bandwidth ceiling that
    any Spark number must be read against. Hosts differ run-to-run in this
    sandbox (VM migrations change the DRAM profile), so the ceiling is
    never hardcoded into the narrative."""
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "BENCH", "kernel_scaling.py")],
        cwd=REPO, capture_output=True, text=True, timeout=1800,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    # 160k convs: below that the local[4+] pipeline is constant-dominated
    # (~25 s wall) and the ratio understates true scaling — measured 0.57
    # apparent at 40k vs 0.8+ at 160k on identical code
    n_primary = int(sys.argv[1]) if len(sys.argv) > 1 else 160000
    n_supp = int(sys.argv[2]) if len(sys.argv) > 2 else 160000
    n_lo = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    n_hi = 4 * n_lo
    kc = kernel_ceiling()
    ra = run_bench(n_lo, n_primary, pipeline_only=True)
    rb = run_bench(n_hi, n_primary, pipeline_only=True)
    r8b = run_bench(8, n_supp)
    r32 = run_bench(32, n_supp)
    ta, tb = ra["turns_per_sec"], rb["turns_per_sec"]
    t8b, t32 = r8b["turns_per_sec"], r32["turns_per_sec"]
    eff = tb / (4 * ta)
    eff_supp = t32 / (4 * t8b)
    # JVM-only channel pair (bench.py times kmv_near_pairs_transcripts in
    # the SAME invocation at each width — no extra runs): the zero-Python
    # strategy's 8->32 ratio isolates how much of the mixed pipeline's gap
    # to the kernel ceiling is the JVM+Python oversubscription.
    kmv8 = r8b["jvm_channel"]["tr_kmv_near_pairs"]
    kmv32 = r32["jvm_channel"]["tr_kmv_near_pairs"]
    kmv_t8 = r8b["bench_turns"] / kmv8
    kmv_t32 = r32["bench_turns"] / kmv32
    kmv_eff = kmv_t32 / (4 * kmv_t8)
    k8, k32 = kc["docs_per_sec"]["8"], kc["docs_per_sec"]["32"]
    k_eff = k32 / (4 * k8)
    # the box's own 1->4 ceiling, measured in the SAME invocation: the
    # supporting pair must be read against it (hosts migrate under this VM
    # and the DRAM profile moves with them — never against a remembered
    # number from another session)
    k1 = kc["docs_per_sec"].get(str(n_lo))
    k4 = kc["docs_per_sec"].get(str(n_hi))
    k_eff_lo = (k4 / (n_hi / n_lo * k1)) if (k1 and k4) else None
    eff_vs_ceiling = (eff / k_eff_lo) if k_eff_lo else None
    if eff_supp >= 0.8:
        supp_verdict = (
            f"**Efficiency = {eff_supp:.3f}** — MEETS the >= 0.8 target on "
            f"this pair.")
    else:
        supp_verdict = (
            f"**Efficiency = {eff_supp:.3f}** against the >= 0.8 target. "
            f"Read honestly: this pair does NOT meet 0.8 on this box, and "
            f"we do not claim it does.")
    # the engine's effective-width guard runs as shipped (a pinned
    # local[32] may be capped at the measured host knee); the decision is
    # part of the engine and is disclosed rather than disabled — a reader
    # must know whether the 32-slot point ran capped
    wg32 = r32.get("width_guard")
    wg8 = r8b.get("width_guard")
    # Counterfactual point: one extra pipeline-only run at the OPPOSITE
    # guard decision (uncapped when the guard capped; capped at 16 when it
    # kept), so every scaling invocation records the capped-vs-kept delta
    # on the same host window — the data the gain-margin rule
    # (widthprobe.gain_margin) keeps calibrating against.
    capped = bool(wg32) and wg32.get("width", 32) < wg32.get(
        "session_width", 32)
    cf_env = ({"SPARK_GRAFT_EFFECTIVE_WIDTH": "off"} if capped
              else {"SPARK_GRAFT_EFFECTIVE_WIDTH": "16"})
    r32cf = run_bench(32, n_supp, pipeline_only=True, extra_env=cf_env)
    cf_wall = r32cf["queries"]["dedup_pipeline"]
    wall32 = r32["queries"]["dedup_pipeline"]
    if capped:
        cf_note = (
            f"guard CAPPED the 32-slot session (width "
            f"{wg32.get('width')}); counterfactual UNCAPPED local[32] ran "
            f"{cf_wall} s vs {wall32} s shipped — the guard "
            f"{'saved' if cf_wall > wall32 else 'cost'} "
            f"{abs(cf_wall - wall32):.1f} s on this window")
    else:
        cf_note = (
            f"guard KEPT full width; counterfactual capped-at-16 local[32] "
            f"ran {cf_wall} s vs {wall32} s shipped — keeping width "
            f"{'won' if cf_wall > wall32 else 'lost'} "
            f"{abs(cf_wall - wall32):.1f} s on this window")
    guard_note = (
        f"\nEffective-width guard (widthprobe.effective_width, shipped "
        f"behavior, disclosed):\nlocal[32] point ran with width_guard = "
        f"`{json.dumps(wg32)}`;\nlocal[8] point: `{json.dumps(wg8)}`. When "
        f"the guard caps the 32-slot session at the\nmeasured host knee, "
        f"this pair measures the ENGINE AS SHIPPED at those session\n"
        f"widths — the honest production number — not raw thread scaling "
        f"(the kernel\nceiling above is the raw-hardware reference).\n\n"
        f"Capped-vs-kept calibration point (same invocation): {cf_note}.\n")
    # Direction-aware reading of the JVM-only vs mixed-pipeline comparison:
    # which strategy scales better at 8->32 flips with the host's same-day
    # behavior, and the narrative must follow the numbers, not a remembered
    # story (one evening the kernel ceiling itself collapsed past 16 procs
    # and the JVM-only channel collapsed with it).
    if kmv_eff >= eff_supp:
        kmv_read = (
            "The delta between these two numbers is the cost of running\n"
            "a Python worker fleet beside the JVM on one oversubscribed "
            "box — on a real\ncluster the executor count, not the thread "
            "count, grows, and each executor\nbrings its own cores and "
            "memory channels.")
    else:
        kmv_read = (
            "On this invocation the JVM-only channel scaled no better than "
            "the mixed\npipeline — consistent with the kernel ceiling "
            "above: when the box itself\nstops delivering compute past the "
            "knee, JVM task threads collapse with it,\ni.e. the limiter "
            "here is the hypervisor's effective-core budget, not the\n"
            "Python worker fleet. Both strategies are reported side by "
            "side every\ninvocation so the limiting factor is measured, "
            "not assumed.")
    stamp = datetime.datetime.now(datetime.timezone.utc).isoformat(timespec="seconds")
    n_runs = os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2")
    md = f"""# BENCH/BASELINE — scaling-efficiency evidence

Protocol (see /root/repo/BASELINE.md): same job, same deterministic input,
two parallelism levels standing in for N and 4N executors. Python workers
are warmed before timing and each point is the best of {n_runs} pipeline
run(s) in one warmed session, so one-time startup and page-cache variance
don't pollute the ratio. Both core pairs are reported; neither replaces
the other.

## Headline: 8 -> 32 cores ({n_supp} conversations, {r8b['bench_turns']} turns)

| run | master | pipeline wall (s) | throughput (turns/s) |
|---|---|---|---|
| A | local[8]  | {r8b['queries']['dedup_pipeline']} | {t8b} |
| B | local[32] | {r32['queries']['dedup_pipeline']} | {t32} |

{supp_verdict}
{guard_note}
Host ceiling, measured in this same invocation (Spark-free numpy signature
kernels, BENCH/kernel_scaling.py): 8 procs {k8:.0f} docs/s aggregate ->
32 procs {k32:.0f} docs/s, i.e. kernel-only 8->32 efficiency {k_eff:.3f}.
The Spark pipeline cannot exceed the box's own compute/bandwidth scaling;
the gap between {eff_supp:.3f} (pipeline) and {k_eff:.3f} (kernel ceiling)
is what the engine's shuffle/partition behavior answers for, the rest is
the machine. Real N -> 4N EXECUTORS each bring their own memory channels,
which is what the supporting below-the-knee pair stands in for.

## JVM-only channel at 8 -> 32 cores (same corpus, same invocation)

The pure-JVM KMV near-dup channel (`functions/kmv.py` — zero Python
workers, whole-stage codegen end to end), timed by bench.py inside the
same two sessions as the headline pair (one run per width):

| run | master | kmv wall (s) | throughput (turns/s) |
|---|---|---|---|
| A | local[8]  | {kmv8} | {kmv_t8:.1f} |
| B | local[32] | {kmv32} | {kmv_t32:.1f} |

**8 -> 32 efficiency = {kmv_eff:.3f}** vs the mixed JVM+Python pipeline's
{eff_supp:.3f}. {kmv_read}

## Supporting: N={n_lo} -> 4N={n_hi} cores ({n_primary} conversations, {ra['bench_turns']} turns)

| run | master | pipeline wall (s) | throughput (turns/s) |
|---|---|---|---|
| A (N)  | local[{n_lo}] | {ra['queries']['dedup_pipeline']} | {ta} |
| B (4N) | local[{n_hi}] | {rb['queries']['dedup_pipeline']} | {tb} |

**Scaling efficiency = T_B / (4 x T_A) = {eff:.3f}** (target >= 0.8)

Box ceiling at the same pair, same invocation (Spark-free kernel procs):
{n_lo} proc {k1 or 0:.0f} docs/s -> {n_hi} procs {k4 or 0:.0f} docs/s =
kernel-only {n_lo}->{n_hi} efficiency {k_eff_lo or 0:.3f}; the pipeline
reaches **{(eff_vs_ceiling or 0) * 100:.0f}% of the box's own {n_lo}->{n_hi}
scaling**. The kernel curve is re-measured every invocation because this
VM migrates across hosts and the DRAM/CPU profile moves with it.

This pair sits below the DRAM saturation knee, which is the closest
single-machine stand-in for the rule's actual criterion — growing
EXECUTORS from N to 4N: each real executor brings its own memory channels,
whereas extra threads on one box share them. All engine-level scalability
properties (hash-partitioned LSH, agg+join connected components,
salted+capped hot buckets, one full-data shuffle, no driver-side loops or
collects) are exercised identically at both points. Per-stage
decomposition of this pair: BENCH/STAGE_SCALING.md (stage_probe.py).

Full bench JSON:

- local[{n_lo}]/{n_primary}: `{json.dumps(ra)}`
- local[{n_hi}]/{n_primary}: `{json.dumps(rb)}`
- local[8]/{n_supp}: `{json.dumps(r8b)}`
- local[32]/{n_supp}: `{json.dumps(r32)}`
- local[32]/{n_supp} guard counterfactual: `{json.dumps(r32cf)}`
- kernel ceiling: `{json.dumps(kc)}`

Generated {stamp} by BENCH/run_scaling.py.
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(json.dumps({"t_lo": ta, "t_hi": tb, "n_lo": n_lo, "n_hi": n_hi,
                      "efficiency": round(eff, 3),
                      "width_guard_32": wg32,
                      "guard_counterfactual":
                          {"capped_shipped": capped,
                           "shipped_wall_s": wall32,
                           "counterfactual_wall_s": cf_wall},
                      "t8_supp": t8b, "t32_supp": t32,
                      "efficiency_supp": round(eff_supp, 3),
                      "kmv_efficiency_8_32": round(kmv_eff, 3),
                      "kernel_8_32_efficiency": round(k_eff, 3),
                      "kernel_lo_hi_efficiency":
                          round(k_eff_lo, 3) if k_eff_lo else None,
                      "efficiency_vs_ceiling":
                          round(eff_vs_ceiling, 3) if eff_vs_ceiling else None}))


if __name__ == "__main__":
    main()
