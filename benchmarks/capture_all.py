"""Round-4 measurement battery: wait for the TPU tunnel, then capture
every benchmark the round needs, serially, each in a bounded subprocess.

The round-3 record was voided by a tunnel outage (VERDICT.md item 1);
this orchestrator exists so that the moment the tunnel returns, the full
battery runs unattended:

  bench.py                       config 4 headline (NSTTF culled)
  -m benchmarks.suite 1 2 3      few-surface megakernel configs
  -m benchmarks.suite 6 7 8      refractive / BDRF / volumetric configs
  -m benchmarks.suite 5          adaptive view factors (batched device path)
  -m benchmarks.curved           curved-facet NSTTF
  -m benchmarks.scaling          field-size scaling incl. 5k/10k row shards

Usage: python -m benchmarks.capture_all [--wait-hours H] [--out DIR]

Results: one JSON line per step in <out>/capture.jsonl with rc, seconds,
and every JSON line the step printed; full stdout/stderr per step in
<out>/<step>.log. A step whose output matches the backend-down
signatures re-enters the wait loop and is retried (up to 3 times).
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

_BACKEND_ERR_SIGNATURES = (
    "Unable to initialize backend",
    "TPU backend setup/compile error",
    "UNAVAILABLE",
    "DEADLINE_EXCEEDED",
    "failed to connect",
    "tpu_backend_unavailable",
)

STEPS = (
    # (name, argv, timeout_s)
    ("bench", [sys.executable, "bench.py"], 3000),
    # Mosaic lowering check of the round's new kernel code paths
    # (pl.when idle skip, polynomial sin/cos, dispersive refraction) —
    # interpret mode checks logic, only hardware checks the lowering
    # ~27 tpu-marked tests, each compile-heavy through the tunnel (1-5
    # min apiece in degradation windows) — 2h bound, not 1h
    ("tpu_tests", [sys.executable, "-m", "pytest", "tests/", "-m", "tpu",
                   "-q", "--no-header"], 7200, {"TRACER_TESTS_TPU": "1"}),
    # --md rewrites the measured rows of BENCHMARKS.md in place, so the
    # numbers persist in the round record even if the tunnel returns
    # after the interactive session ended
    ("suite_123", [sys.executable, "-m", "benchmarks.suite", "1", "2", "3",
                   "--md"], 2400),
    ("suite_678", [sys.executable, "-m", "benchmarks.suite", "6", "7", "8",
                   "9", "--md"], 2400),
    ("suite_5", [sys.executable, "-m", "benchmarks.suite", "5", "--md"],
     2400),
    ("curved", [sys.executable, "-m", "benchmarks.curved"], 2400),
    ("scaling", [sys.executable, "-m", "benchmarks.scaling"], 5400),
)


def _probe_backend(timeout_s: int = 120) -> tuple:
    code = "import jax; print(jax.devices()[0].platform)"
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True,
                           timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return False, f"backend init exceeded {timeout_s}s"
    if r.returncode == 0:
        return True, r.stdout.strip()
    tail = (r.stderr or r.stdout).strip().splitlines()[-1:] or ["unknown"]
    return False, tail[0][:300]


def _wait_for_backend(deadline: float, poll_s: float = 300.0) -> bool:
    while True:
        ok, detail = _probe_backend()
        if ok:
            print(f"[capture] backend up: {detail}", file=sys.stderr)
            return True
        now = time.time()
        if now >= deadline:
            print(f"[capture] giving up: {detail}", file=sys.stderr)
            return False
        sleep = min(poll_s, max(deadline - now, 1.0))
        print(f"[capture] backend down ({detail}); retry in "
              f"{sleep:.0f}s", file=sys.stderr)
        time.sleep(sleep)


def _run_step(name, argv, timeout_s, out_dir, env_extra=None):
    t0 = time.time()
    env = None
    if env_extra:
        env = dict(os.environ)
        env.update(env_extra)
    try:
        r = subprocess.run(argv, capture_output=True, text=True,
                           timeout=timeout_s, env=env,
                           cwd=os.path.dirname(os.path.dirname(
                               os.path.abspath(__file__))))
        rc, out, err = r.returncode, r.stdout, r.stderr
        timed_out = False
    except subprocess.TimeoutExpired as e:
        rc, timed_out = -1, True
        out = e.stdout if isinstance(e.stdout, str) else \
            (e.stdout or b"").decode(errors="replace")
        err = e.stderr if isinstance(e.stderr, str) else \
            (e.stderr or b"").decode(errors="replace")
    dt = time.time() - t0
    with open(os.path.join(out_dir, f"{name}.log"), "a") as f:
        f.write(f"=== {time.strftime('%F %T')} rc={rc} {dt:.1f}s ===\n")
        f.write(out or "")
        f.write("\n--- stderr ---\n")
        f.write(err or "")
        f.write("\n")
    jlines = [ln.strip() for ln in (out or "").splitlines()
              if ln.strip().startswith("{")]
    backend_down = timed_out or any(
        sig in (out or "") + (err or "") for sig in _BACKEND_ERR_SIGNATURES)
    return {"step": name, "rc": rc, "seconds": round(dt, 1),
            "timed_out": timed_out, "backend_down": bool(backend_down),
            "results": [json.loads(ln) for ln in jlines
                        if _loads_ok(ln)]}


def _loads_ok(ln: str) -> bool:
    try:
        json.loads(ln)
        return True
    except Exception:
        return False


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--wait-hours", type=float, default=10.0)
    ap.add_argument("--out", default="benchmarks/r4_results")
    ap.add_argument("--steps", nargs="*", default=None,
                    help="subset of step names to run")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    deadline = time.time() + args.wait_hours * 3600.0
    record_path = os.path.join(args.out, "capture.jsonl")

    steps = [s for s in STEPS if not args.steps or s[0] in args.steps]
    for step in steps:
        name, argv, timeout_s = step[:3]
        env_extra = step[3] if len(step) > 3 else None
        for attempt in range(3):
            if not _wait_for_backend(deadline):
                print(f"[capture] deadline passed before {name}",
                      file=sys.stderr)
                return 2
            print(f"[capture] running {name} (attempt {attempt + 1})",
                  file=sys.stderr)
            rec = _run_step(name, argv, timeout_s, args.out, env_extra)
            rec["attempt"] = attempt + 1
            rec["ts"] = time.strftime("%F %T")
            with open(record_path, "a") as f:
                f.write(json.dumps(rec) + "\n")
            for res in rec["results"]:
                print(json.dumps({"step": name, **res}))
            if not rec["backend_down"]:
                break
            print(f"[capture] {name} hit a backend outage; re-probing",
                  file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
