"""One-shot runner for the queued on-chip experiments
(docs/NEXT_EXPERIMENTS.md). Run the moment the TPU relay is back:

    python -u scripts/run_pending_experiments.py [--quick]

Each experiment runs in a FRESH subprocess (clean HBM, immune to a
relay hang killing the whole sweep) under a hard timeout; stdout tails
append to docs/experiments_r2.jsonl as they complete, so a mid-sweep
relay death still leaves every finished result on disk.
"""

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "docs", "experiments_r2.jsonl")


def run(name: str, cmd: list, timeout: int) -> dict:
    t0 = time.time()
    try:
        p = subprocess.run(cmd, cwd=ROOT, capture_output=True, text=True,
                           timeout=timeout)
        rc, out, err = p.returncode, p.stdout, p.stderr
    except subprocess.TimeoutExpired as e:
        rc = -1
        out = (e.stdout or b"").decode() if isinstance(e.stdout, bytes) else (e.stdout or "")
        err = f"TIMEOUT after {timeout}s"
    rec = {
        "name": name,
        "cmd": " ".join(cmd),
        "rc": rc,
        "secs": round(time.time() - t0, 1),
        "tail": out[-2000:],
        "err_tail": (err or "")[-500:],
        "ts": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(f"== {name}: rc={rc} {rec['secs']}s", flush=True)
    print(out[-800:], flush=True)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="only the headline bench + flagship check")
    ap.add_argument("--only", default=None, help="comma list of names")
    args = ap.parse_args()
    py = sys.executable

    experiments = [
        # Headline staged bench with the new fwd bt=256 default (#2);
        # batch pinned (bench.py's default start is now 49152).
        ("bench_staged_32768",
         [py, "bench.py", "--batch=32768", "--timeout=600"], 700),
        # Flagship numeric check on real silicon (#6): kernels +
        # streamed update have only been validated in interpret mode.
        ("flagship_learn_check",
         [py, "-u", "-m", "cffm_tpu.train", "--config=criteo_kaggle",
          "--data.num_train_steps=300", "--data.batch_size=8192",
          "--log_every=50", "--data.eval_batches=8"], 900),
        # Batch sweep (#1): apply cost is batch-independent; 2x batch
        # should amortize. 49152 first (safer), then 65536 (edge).
        ("bench_staged_49152",
         [py, "bench.py", "--batch=49152", "--timeout=600"], 700),
        ("bench_staged_65536",
         [py, "bench.py", "--batch=65536", "--timeout=600"], 700),
        ("bench_staged_40960",
         [py, "bench.py", "--batch=40960", "--timeout=600"], 700),
        # Reader-fed refresh (#4) + the new prehashed feed.
        ("bench_reader",
         [py, "bench.py", "--feed=reader", "--timeout=600"], 700),
        ("bench_prehashed",
         [py, "bench.py", "--feed=prehashed", "--timeout=600"], 700),
        # bf16 table storage (#8): halves table HBM (6.6->3.3 GB) and
        # gather traffic; stochastic-rounding updates. Speed here,
        # quality via flagship_bf16_learn_check below.
        ("bench_staged_bf16",
         [py, "bench.py", "--table_dtype=bfloat16", "--batch=32768",
          "--timeout=600"], 700),
        ("bench_staged_bf16_65536",
         [py, "bench.py", "--table_dtype=bfloat16", "--batch=65536",
          "--timeout=600"], 700),
        ("flagship_bf16_learn_check",
         [py, "-u", "-m", "cffm_tpu.train", "--config=criteo_kaggle",
          "--model.table_dtype=bfloat16", "--data.num_train_steps=300",
          "--data.batch_size=8192", "--log_every=50",
          "--data.eval_batches=8"], 900),
        # Kernel micro-bench: fwd bt sweep to confirm the picker (#2).
        ("kernel_bts",
         [py, "scripts/bench_kernel.py", "--bts=128,256,512"], 700),
        # Gather scaling probe (#7): decides the bf16-shadow question.
        ("probe_gather", [py, "scripts/probe_gather.py"], 700),
        # Fresh step trace (#5) for the README budget table.
        ("trace_step", [py, "scripts/trace_step.py"], 900),
    ]
    if args.quick:
        keep = {"bench_staged_32768", "flagship_learn_check"}
        experiments = [e for e in experiments if e[0] in keep]
    if args.only:
        names = set(args.only.split(","))
        experiments = [e for e in experiments if e[0] in names]

    results = []
    for name, cmd, timeout in experiments:
        results.append(run(name, cmd, timeout))
        # A relay death turns everything after it into pure timeout
        # burn; stop early if two consecutive runs died without output.
        if (len(results) >= 2 and all(
                r["rc"] != 0 and not r["tail"].strip()
                for r in results[-2:])):
            print("== two consecutive silent failures — relay likely "
                  "dead, stopping sweep", flush=True)
            break
    ok = sum(1 for r in results if r["rc"] == 0)
    print(f"== done: {ok}/{len(results)} succeeded; results in {OUT}")


if __name__ == "__main__":
    main()
