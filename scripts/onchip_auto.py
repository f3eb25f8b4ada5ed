"""Unattended on-chip session: run the ONCHIP.md runbook end to end
with per-stage timeouts and persist partial results as they land —
designed so even a short TPU-tunnel window yields the decisions the
round needs (verify kernels, pick the superstep variant, headline).

Run: python scripts/onchip_auto.py [--out /tmp/onchip_results.json]
     [--skip-profiles] [--bench-repeats 1]

Stages (cheap triage first; a stage failure records the error and
continues where that is safe):
  1. devices probe (fails fast if the tunnel is down)
  2. probe_merge_compile.py  — Mosaic lowering of the round-2 kernels
  3. bench --verify          — golden equality with all kernels active
  4. bench A/B               — {auto, merge} x {legacy, packed} matrix
  5. profile_sort.py         — sort-strategy data for the next round
  6. profile_pipeline.py     — wall-time gap breakdown

The A/B matrix result prints a FLIP RECOMMENDATION: if a non-default
variant wins by >5%, flip the matching "auto" branch in
ops/sortcount.resolve_compactor / resolve_winkeys, re-run stage 3, and
re-bench (the script does NOT edit code).
"""

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cmd, timeout_s, log):
    """Run a subprocess with timeout; return (rc, combined output)."""
    t0 = time.time()
    try:
        p = subprocess.run(cmd, cwd=REPO, timeout=timeout_s,
                           capture_output=True, text=True)
        out = p.stdout + p.stderr
        rc = p.returncode
    except subprocess.TimeoutExpired as e:
        out = ((e.stdout or b"").decode(errors="replace")
               + (e.stderr or b"").decode(errors="replace")
               + f"\n[TIMEOUT after {timeout_s}s]")
        rc = -1
    dt = time.time() - t0
    log(f"$ {' '.join(cmd)}  -> rc={rc} in {dt:.0f}s")
    return rc, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/onchip_results.json")
    ap.add_argument("--skip-profiles", action="store_true")
    ap.add_argument("--bench-repeats", type=int, default=1)
    args = ap.parse_args()
    results = {"started": time.strftime("%F %T")}

    def log(msg):
        print(msg, flush=True)

    def save():
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)

    py = sys.executable

    # 1. tunnel probe
    rc, out = run([py, "-c", "import jax; print(jax.devices())"], 120, log)
    results["devices"] = out.strip().splitlines()[-1] if out.strip() else ""
    save()
    if rc != 0:
        log("tunnel down — aborting")
        return 1

    # 2. kernel compile probe (tiny shapes, bit-diff vs interpreter)
    rc, out = run([py, "scripts/probe_merge_compile.py"], 900, log)
    results["probe_merge_compile"] = {
        "rc": rc, "tail": out.strip().splitlines()[-12:]}
    save()

    # 3. verify (golden equality, all kernels)
    rc, out = run([py, "bench.py", "--verify"], 1800, log)
    m = re.search(r"\{.*\}", out, re.S)
    results["verify"] = json.loads(m.group(0)) if (rc == 0 and m) else {
        "rc": rc, "tail": out.strip().splitlines()[-12:]}
    save()

    # 4. bench A/B matrix
    matrix = {}
    for compactor in ("auto", "merge"):
        for winkeys in ("legacy", "packed"):
            key = f"{compactor}+{winkeys}"
            rc, out = run(
                [py, "bench.py", "--compactor", compactor,
                 "--winkeys", winkeys,
                 "--repeats", str(args.bench_repeats)], 1800, log)
            m = re.search(r'\{"metric".*\}', out)
            matrix[key] = json.loads(m.group(0))["value"] if m else \
                {"rc": rc, "tail": out.strip().splitlines()[-6:]}
            log(f"  {key}: {matrix[key]}")
            results["bench_matrix"] = matrix
            save()
    numeric = {k: v for k, v in matrix.items() if isinstance(v, (int, float))}
    if numeric:
        best = max(numeric, key=numeric.get)
        default = numeric.get("auto+legacy", 0)
        results["flip_recommendation"] = (
            f"{best} wins at {numeric[best]:,} k-mers/s"
            + (f" (+{(numeric[best]/default - 1)*100:.0f}% over default)"
               if default else "")
            + ("" if best == "auto+legacy" or not default
               or numeric[best] < 1.05 * default else
               " -> FLIP resolve_compactor/resolve_winkeys, re-verify, re-bench"))
        log("RECOMMENDATION: " + results["flip_recommendation"])
    save()

    # 5+6. profiles for the next round's levers
    if not args.skip_profiles:
        for script, t in (("scripts/profile_sort.py", 1800),
                          ("scripts/profile_pipeline.py", 1800)):
            rc, out = run([py, script], t, log)
            results[os.path.basename(script)] = {
                "rc": rc, "output": out.strip().splitlines()[-40:]}
            save()

    log(f"results -> {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
