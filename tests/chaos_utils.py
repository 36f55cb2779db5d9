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
import select
import signal
import subprocess
import sys
import time


def _read_until_ready(stream, deadline):
    """Accumulate raw child output until a line containing READY, EOF, or
    the deadline. The stream must be an UNBUFFERED binary pipe: select()
    only sees the OS pipe, so any userspace buffering would strand data
    select can't observe. Returns (bytes_read, saw_ready)."""
    buf = b""
    while time.time() < deadline:
        ready, _, _ = select.select([stream], [], [], min(1.0, max(0.0, deadline - time.time())))
        if not ready:
            continue
        chunk = stream.read(4096)
        if not chunk:
            return buf, False
        buf += chunk
        # only count READY once its line is complete, so the caller never
        # arms the kill timer on a partially-flushed marker
        head, nl, _ = buf.rpartition(b"\n")
        if nl and b"READY" in head:
            return buf, True
    return buf, False


def run_child(argv, kill_after=None, timeout=600, evidence=None, wait_ready=True):
    """Run a chaos child; optionally SIGKILL it mid-work.

    ``argv`` is the full child argument list after the interpreter.
    With ``kill_after`` set: wait for the READY line (if ``wait_ready``),
    then for ``evidence()`` to go truthy (if given) — arming the timer
    from the first evidence of WORK, not from READY, because otherwise
    every kill can land in the post-READY compile window and the resume
    machinery is never actually exercised — then sleep ``kill_after``
    seconds and SIGKILL. Returns ``(returncode, output, killed)`` where
    ``killed`` is True only when THIS function sent the SIGKILL — a child
    the kernel OOM-kills also exits with -9, and attributing that to the
    test's own kill once turned an environment problem into an opaque
    "kills never landed mid-work" failure. A child that dies before
    READY returns its real exit code with everything it printed (the
    only diagnostic if setup crashes). XLA_FLAGS is stripped from the
    environment so children self-provision their own platform config.
    """
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    p = subprocess.Popen(
        [sys.executable] + list(argv),
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        bufsize=0,
        env=env,
    )
    if kill_after is None:
        out, _ = p.communicate(timeout=timeout)
        return p.returncode, out.decode(errors="replace"), False
    deadline = time.time() + timeout
    pre = b""
    if wait_ready:
        pre, _ = _read_until_ready(p.stdout, deadline)
    if evidence is not None:
        while time.time() < deadline and p.poll() is None:
            if evidence():
                break
            time.sleep(0.02)
    time.sleep(kill_after)
    if p.poll() is None:
        os.kill(p.pid, signal.SIGKILL)
        p.wait(timeout=30)
        out = (pre + p.stdout.read()).decode(errors="replace")
        return -9, out, True
    return p.returncode, (pre + p.stdout.read()).decode(errors="replace"), False


def kill_anywhere(run, midwork, delays, attempts=10, kill_attempts=6, done_token="DONE"):
    """Staggered-kill rerun loop.

    ``run(kill_after)`` executes one child attempt; the first
    ``kill_attempts`` attempts get SIGKILLed after ``delays`` (clamped to
    the last entry), the rest run to completion. ``midwork()`` checks
    whether on-disk state shows the previous kill landed after work
    started. Asserts the run eventually completes and that — when kills
    happened at all — at least one landed mid-work (a machine fast
    enough to finish before the first kill timer proves nothing, so
    mid-work evidence is only required when there were kills). A child
    that fails on its own (nonzero exit without a kill) is counted and
    reported separately so a deterministic child bug isn't misdiagnosed
    as a resume problem. Returns the number of kills.
    """
    kills = midwork_kills = failures = 0
    rc, out = -1, ""
    fail_tails = []
    for attempt in range(attempts):
        kill_after = delays[min(attempt, len(delays) - 1)] if attempt < kill_attempts else None
        rc, out, killed = run(kill_after)
        if rc == 0 and (done_token is None or done_token in out):
            break
        if killed:
            kills += 1
            if midwork():
                midwork_kills += 1
        else:
            failures += 1
            fail_tails.append(f"[attempt {attempt} rc={rc}] {out[-800:]}")
    assert rc == 0 and (done_token is None or done_token in out), (
        # rc == 0 alone is NOT completion: a resume bug that makes the
        # child wrongly believe all work is done exits 0 without the
        # done token, and the final attempt must not green-light that
        f"never completed: {kills} kills, {failures} un-killed failures; "
        f"failure tails: {fail_tails}; last output tail: {out[-2000:]}"
    )
    assert kills == 0 or midwork_kills >= 1, (
        f"kills never landed after work started ({kills} kills, {failures} "
        f"un-killed failures); failure tails: {fail_tails}"
    )
    return kills
