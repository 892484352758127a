#!/usr/bin/env python
"""Persistent TPU worker: claims the one TPU chip once, then executes job files.

Why: only ONE process may hold the axon TPU claim at a time; a second claimer can
hang forever and killed claimers poison the queue for ~10-15 min. So this worker
claims once and stays alive, and every TPU task is submitted as a job file.

Usage:
    python tools/tpu_worker.py            # run in background (Tmux / bash &)

Submitting jobs:
    Write the job script OUTSIDE /tmp/tpuq (e.g. /tmp/job_x.py), then
    `mv /tmp/job_x.py /tmp/tpuq/` — the worker can pick up half-written files.
    Jobs are plain python scripts exec'd with __name__ == "__main__" in an
    ISOLATED globals dict (shared dicts let foreign scripts clobber each other's
    corpus names). Output streams to /tmp/tpuq/<job>.py.out (tail -f friendly);
    on completion a final line "### OK|FAIL in Ns" is appended and the job file
    moves to /tmp/tpuq/done/.

Caveats (hard-won, see CLAUDE.md):
    - The worker process CACHES hnsw_tpu imports: after editing library code,
      restart the worker (SIGINT while idle) or jobs run stale code. Scripts
      exec'd from disk by the job itself (e.g. bench.py) are always fresh.
    - SIGINT during a job aborts it but KEEPS the TPU claim (BaseException is
      caught); the signal lands at the next Python bytecode, so a giant numpy
      call must finish first. SIGINT while idle exits cleanly.
"""
import glob
import io
import os
import signal
import sys
import time
import traceback

# nohup/background-shell launches leave SIGINT at SIG_IGN, which would make the
# worker unstoppable by its documented "SIGINT while idle" protocol — restore it
signal.signal(signal.SIGINT, signal.default_int_handler)

QDIR = "/tmp/tpuq"
DONE = os.path.join(QDIR, "done")
os.makedirs(DONE, exist_ok=True)
sys.path.insert(0, "/root/repo")

import jax  # noqa: E402  (claim the chip up front so jobs never race for it)

print("tpu_worker: devices =", jax.devices(), flush=True)
with open(os.path.join(QDIR, "WORKER_READY"), "w") as f:
    f.write(f"{os.getpid()} {time.time()}\n")


class _Tee:
    def __init__(self, *streams):
        self.streams = streams

    def write(self, x):
        for s in self.streams:
            try:
                s.write(x)
                s.flush()
            except ValueError:
                pass  # a late writer (leaked logging handler) hit a closed file

    def flush(self):
        for s in self.streams:
            try:
                s.flush()
            except ValueError:
                pass

    def close(self):  # logging.shutdown may close a leaked handler's stream
        pass


def run_job(job: str) -> None:
    out_path = job + ".out"
    t0 = time.time()
    src = open(job).read()
    old_out, old_err = sys.stdout, sys.stderr
    env_snapshot = dict(os.environ)  # jobs set os.environ freely; don't let it
    # leak into later jobs (a leaked BENCH_DATASET=clustered once silently
    # turned an intended-gaussian 1M bench into a clustered one)
    status = "FAIL"
    with open(out_path, "w") as out:
        sys.stdout = _Tee(out, old_out)
        sys.stderr = _Tee(out, old_err)
        try:
            exec(compile(src, job, "exec"), {"__name__": "__main__", "__file__": job})
            status = "OK"
        except BaseException:
            traceback.print_exc()
        finally:
            sys.stdout, sys.stderr = old_out, old_err
            os.environ.clear()
            os.environ.update(env_snapshot)
            out.write(f"\n### {status} in {time.time() - t0:.1f}s\n")
    os.rename(job, os.path.join(DONE, os.path.basename(job)))
    print(f"tpu_worker: {job} -> {status} ({time.time() - t0:.1f}s)", flush=True)


def main():
    print("tpu_worker: watching", QDIR, flush=True)
    while True:
        jobs = sorted(p for p in glob.glob(os.path.join(QDIR, "*.py")) if not p.endswith(".out"))
        if not jobs:
            time.sleep(1.0)
            continue
        run_job(jobs[0])


if __name__ == "__main__":
    main()
