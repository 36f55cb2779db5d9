"""Shard job fan-out runner — the TPU-pod replacement for the reference's
Slurm submit layer (SURVEY §2.1 #22-23: submit_shard.sh /
submit_all_shards*.sh / cancel_all_jobs.sh / job templates).

One shard per worker process (in production: one shard per TPU host; the
coordination plane stays shared-nothing — progress files + the artifact
hub, exactly like the reference's Slurm jobs). Provides:

  - ``run``: read a shard list, launch ``--cmd`` per shard with ``{shard}``
    substitution, throttle to ``--max-concurrent`` (submit_all_shards.sh
    polling loop, emilia-mimi/submit_all_shards.sh:104-143), skip shards
    whose progress ledger says completed or that are already running
    (skip-if-queued, :82-97), per-shard log files, pidfile registry;
  - ``cancel``: kill every live job in the pidfile registry
    (cancel_all_jobs.sh).
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time
from typing import Dict

from tokenize_audio_tpu.runner.progress import read_json


def _pidfile(run_dir: str) -> str:
    return os.path.join(run_dir, "jobs.json")


def _load_jobs(run_dir: str) -> Dict[str, int]:
    return read_json(_pidfile(run_dir), {}) or {}


def _save_jobs(run_dir: str, jobs: Dict[str, int]) -> None:
    os.makedirs(run_dir, exist_ok=True)
    with open(_pidfile(run_dir), "w") as f:
        json.dump(jobs, f)


def _alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
        return True
    except (ProcessLookupError, PermissionError):
        return False


def shard_completed(progress_dir: str, shard: str, expected_units: int | None = None) -> bool:
    state = read_json(os.path.join(progress_dir, f"{shard}_progress.json"), None)
    if not state:
        return False
    completed = len(state.get("completed", []))
    if expected_units is not None:
        return completed >= expected_units
    return bool(state.get("meta", {}).get("done"))


def _visible_tpu_devices():
    """TPU chip count without initializing a JAX backend in the runner
    process (which would itself claim the chip): trust an explicit env
    override, else count /dev/accel* device nodes. None = unknown."""
    import glob

    env = os.environ.get("TOKENIZE_AUDIO_TPU_DEVICES")
    if env:
        try:
            return int(env)
        except ValueError:
            return None
    nodes = glob.glob("/dev/accel*") + [
        p for p in glob.glob("/dev/vfio/*") if p != "/dev/vfio/vfio"
    ]  # /dev/vfio/vfio is the container control node, not a device
    return len(nodes) or None


def run(args) -> int:
    if args.max_concurrent > 1:
        # TPU processes cannot share a chip: concurrent encoders on one
        # device serialize unpredictably (and on tunneled fabrics contend
        # for the claim). Warn unless the host clearly has enough devices.
        n_dev = _visible_tpu_devices()
        if n_dev is not None and n_dev < args.max_concurrent:
            print(
                f"[pod-runner] WARNING: --max-concurrent={args.max_concurrent} "
                f"but only {n_dev} TPU device(s) visible; concurrent shard "
                "processes will contend for the same chip and serialize. "
                "Use 1 process per chip (or CPU-only stages) instead."
            )
    with open(args.shard_list) as f:
        shards = [line.strip() for line in f if line.strip() and not line.startswith("#")]
    os.makedirs(args.log_dir, exist_ok=True)
    jobs = {s: pid for s, pid in _load_jobs(args.run_dir).items() if _alive(pid)}
    launched = skipped = 0
    procs: Dict[str, subprocess.Popen] = {}

    log_handles = {}

    def poll():
        for s, p in list(procs.items()):
            if p.poll() is not None:
                print(f"[pod-runner] shard {s} exited with {p.returncode}")
                del procs[s]
                h = log_handles.pop(s, None)
                if h is not None:
                    h.close()  # one fd per launched shard otherwise leaks
                jobs.pop(s, None)
                _save_jobs(args.run_dir, jobs)
        # adopted jobs (still-alive pids from a previous run) count toward
        # the concurrency cap too — a rerun must not oversubscribe the chip
        for s, pid in list(jobs.items()):
            if s not in procs and not _alive(pid):
                jobs.pop(s, None)
                _save_jobs(args.run_dir, jobs)

    def active() -> int:
        return len(procs) + sum(1 for s in jobs if s not in procs)

    for shard in shards:
        if shard in jobs:  # skip-if-queued
            print(f"[pod-runner] {shard}: already running (pid {jobs[shard]})")
            skipped += 1
            continue
        if args.progress_dir and shard_completed(args.progress_dir, shard):
            print(f"[pod-runner] {shard}: already completed")
            skipped += 1
            continue
        while active() >= args.max_concurrent:
            poll()
            time.sleep(args.poll_seconds)
        cmd = [c.replace("{shard}", shard) for c in args.cmd]
        log_path = os.path.join(args.log_dir, f"{shard}.log")
        log_f = open(log_path, "a")
        p = subprocess.Popen(cmd, stdout=log_f, stderr=subprocess.STDOUT)
        log_handles[shard] = log_f
        procs[shard] = p
        jobs[shard] = p.pid
        _save_jobs(args.run_dir, jobs)
        print(f"[pod-runner] launched {shard} (pid {p.pid}) -> {log_path}")
        launched += 1

    rc = 0
    if args.wait:
        while procs:
            poll()
            time.sleep(args.poll_seconds)
    print(f"[pod-runner] launched={launched} skipped={skipped}")
    return rc


def cancel(args) -> int:
    jobs = _load_jobs(args.run_dir)
    killed = 0
    for shard, pid in jobs.items():
        if _alive(pid):
            print(f"[pod-runner] killing {shard} (pid {pid})")
            try:
                os.kill(pid, signal.SIGTERM)
                killed += 1
            except ProcessLookupError:
                pass
    # keep registry entries for pids that are still shutting down: wiping
    # them immediately would let a concurrent `run` miss skip-if-queued and
    # launch a duplicate onto the same progress file/chip
    deadline = time.time() + 10.0
    while time.time() < deadline and any(_alive(p) for p in jobs.values()):
        time.sleep(0.2)
    _save_jobs(args.run_dir, {s: p for s, p in jobs.items() if _alive(p)})
    still = sum(1 for p in jobs.values() if _alive(p))
    print(f"[pod-runner] killed {killed} jobs" + (f" ({still} still exiting, kept in registry)" if still else ""))
    return 0


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="action", required=True)

    r = sub.add_parser("run")
    r.add_argument("--shard-list", required=True)
    r.add_argument("--max-concurrent", type=int, default=1)
    r.add_argument("--poll-seconds", type=float, default=5.0)
    r.add_argument("--run-dir", default="/tmp/ta_pod")
    r.add_argument("--log-dir", default="/tmp/ta_pod/logs")
    r.add_argument("--progress-dir", default=None)
    r.add_argument("--wait", action="store_true")
    r.add_argument("cmd", nargs=argparse.REMAINDER,
                   help="command template after '--'; {shard} is substituted")

    c = sub.add_parser("cancel")
    c.add_argument("--run-dir", default="/tmp/ta_pod")

    args = ap.parse_args(argv)
    if args.action == "run":
        if args.cmd and args.cmd[0] == "--":
            args.cmd = args.cmd[1:]
        return run(args)
    return cancel(args)


if __name__ == "__main__":
    sys.exit(main())
