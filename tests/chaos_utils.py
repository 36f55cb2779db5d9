"""Shared scaffolding for the SIGKILL chaos tests.

Every chaos test follows the same protocol: run a child process that
prints READY once setup is done and DONE on success; hard-kill it at
staggered delays after the first evidence of real work; rerun the same
command until it completes; assert the final artifacts equal an
uninterrupted run's. This module holds the two pieces every test was
duplicating — the kill-armed child runner and the staggered-kill rerun
loop — so the per-family tests carry only their workload, their
work-evidence predicate, and their artifact comparison.
"""

import os
import signal
import subprocess
import sys
import time


def run_child(argv, kill_after=None, timeout=600, evidence=None, wait_ready=True):
    """Run a chaos child; optionally SIGKILL it mid-work.

    ``argv`` is the full child argument list after the interpreter.
    With ``kill_after`` set: wait for the READY line (if ``wait_ready``),
    then for ``evidence()`` to go truthy (if given) — arming the timer
    from the first evidence of WORK, not from READY, because otherwise
    every kill can land in the post-READY compile window and the resume
    machinery is never actually exercised — then sleep ``kill_after``
    seconds and SIGKILL. Returns ``(returncode, output)``; a killed run
    returns ``(-9, "")``. XLA_FLAGS is stripped from the environment so
    children self-provision their own platform config.
    """
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    p = subprocess.Popen(
        [sys.executable] + list(argv),
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
        env=env,
    )
    if kill_after is None:
        out, _ = p.communicate(timeout=timeout)
        return p.returncode, out
    deadline = time.time() + timeout
    line = ""
    if wait_ready:
        while time.time() < deadline:
            line = p.stdout.readline()
            if "READY" in line or not line:
                break
    if evidence is not None:
        while time.time() < deadline and p.poll() is None:
            if evidence():
                break
            time.sleep(0.02)
    time.sleep(kill_after)
    if p.poll() is None:
        os.kill(p.pid, signal.SIGKILL)
        p.wait(timeout=30)
        p.stdout.read()
        return -9, ""
    return p.returncode, line + p.stdout.read()


def kill_anywhere(run, midwork, delays, attempts=10, kill_attempts=6, done_token="DONE"):
    """Staggered-kill rerun loop.

    ``run(kill_after)`` executes one child attempt; the first
    ``kill_attempts`` attempts get SIGKILLed after ``delays`` (clamped to
    the last entry), the rest run to completion. ``midwork()`` checks
    whether on-disk state shows the previous kill landed after work
    started. Asserts the run eventually completes and that — when kills
    happened at all — at least one landed mid-work (a machine fast
    enough to finish before the first kill timer proves nothing, so
    mid-work evidence is only required when there were kills).
    Returns the number of kills, for tests that want to log or bound it.
    """
    kills = midwork_kills = 0
    rc, out = -1, ""
    for attempt in range(attempts):
        kill_after = delays[min(attempt, len(delays) - 1)] if attempt < kill_attempts else None
        rc, out = run(kill_after)
        if rc == 0 and (done_token is None or done_token in out):
            break
        kills += 1
        if midwork():
            midwork_kills += 1
    assert rc == 0, f"never completed after {kills} kills: {out[-2000:]}"
    assert kills == 0 or midwork_kills >= 1, "kills never landed after work started"
    return kills
