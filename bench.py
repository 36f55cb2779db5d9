"""Benchmark: audio-hours tokenized per wall hour per chip (Mimi encode).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target (BASELINE.json): >50x real-time per v5e chip.

This is the driver entry point; the benchmark itself lives in the package
(``tokenize_audio_tpu.benchmark.run_engine_bench`` — also runnable as
``python -m tokenize_audio_tpu.benchmark``, and ``--pipeline`` for the
full end-to-end production path). This wrapper adds what the DRIVER
needs: a stall watchdog (a tunneled chip claim can wedge server-side with
zero output) and stage heartbeats on stderr so a killed attempt's tail
shows where it stalled. A persistent XLA compile cache makes every run
after the first compile-free.
"""

import json
import os
import sys
import threading
import time

_T0 = time.time()
_STAGE = {"name": "starting"}


def _hb(stage: str) -> None:
    """Stage-transition heartbeat to stderr: makes a driver-killed run
    diagnosable (wedged chip claim = heartbeats stop advancing past
    'device_claim'; compiling = 'warmup' with elapsed ticking up)."""
    _STAGE["name"] = stage
    print(
        json.dumps({"hb": stage, "elapsed_s": round(time.time() - _T0, 1)}),
        file=sys.stderr,
        flush=True,
    )


def _start_heartbeat_thread(period_s: float = 30.0) -> None:
    def tick():
        while True:
            time.sleep(period_s)
            _hb(_STAGE["name"])

    threading.Thread(target=tick, daemon=True).start()


def main():
    _start_heartbeat_thread()
    _hb("imports")
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
    import jax

    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from tokenize_audio_tpu.benchmark import run_engine_bench

    # Print the ONE stdout JSON line the instant the headline passes finish
    # (on_headline fires before the optional fused-16k stage): the r4-early
    # post-mortem showed the headline completing at ~583 s and then a wedged
    # fused-stage compile eating the deadline — the number must be unlosable.
    def emit(result):
        print(json.dumps(result))
        sys.stdout.flush()

    # fused_16k=False: the optional fused-resample stage twice burned
    # >600 s of remote compiles on this fabric (r4 post-mortems); the
    # driver channel runs headline-only. The module CLI keeps it.
    run_engine_bench(progress=_hb, on_headline=emit, fused_16k=False)


def watchdog(cmd=None):
    """Run the benchmark in a child with a deadline, retrying once.

    The tunneled fabric's chip claim occasionally wedges server-side with
    zero output (observed once: ~50 min stuck in the first device touch,
    where an immediate plain retry finished in ~4 min — OPERATIONS.md §1).
    A normal run takes single-digit minutes even with cold compiles, so a
    stalled child is killed at the deadline and the benchmark retried in a
    fresh process, which gets a fresh claim.

    The ladder MUST fit the caller's window: the r3 ladder (1500 s +
    2700 s) exceeded the driver's timeout and a wedged attempt 1 left the
    round with no official number (VERDICT r3 weak #1). 900 s + 900 s
    keeps both attempts plus a healthy run inside a 30-45 min window;
    override with TOKENIZE_AUDIO_BENCH_DEADLINES="a,b". The child's
    stderr heartbeats (one JSON line per stage + a 30 s ticker) pass
    through, so a killed attempt's tail shows WHERE it stalled. Disable
    with TOKENIZE_AUDIO_BENCH_WATCHDOG=0 (then main() runs in-process).

    Child stdout is STREAMED through line by line (not buffered to the
    end): the child prints the headline JSON as soon as it is measured, so
    even if a later optional stage wedges and the deadline kills the child,
    the number already reached the caller — in that case exit 0.
    """
    import subprocess

    deadlines = tuple(
        int(x)
        for x in os.environ.get("TOKENIZE_AUDIO_BENCH_DEADLINES", "900,900").split(",")
    )
    cmd = cmd or [sys.executable, os.path.abspath(__file__), "--inner"]
    for deadline_s in deadlines:
        proc = subprocess.Popen(
            cmd,
            stdout=subprocess.PIPE,
            text=True,
        )
        result_seen = threading.Event()

        def forward(stream=proc.stdout):
            for line in stream:
                sys.stdout.write(line)
                sys.stdout.flush()
                try:
                    if "metric" in json.loads(line):
                        result_seen.set()
                except (json.JSONDecodeError, TypeError):
                    pass

        fwd = threading.Thread(target=forward, daemon=True)
        fwd.start()
        try:
            rc = proc.wait(timeout=deadline_s)
            fwd.join(timeout=10)
            if rc == 0 or result_seen.is_set():
                raise SystemExit(0)
            raise SystemExit(rc)
        except subprocess.TimeoutExpired:
            proc.kill()
            proc.wait()
            fwd.join(timeout=10)
            if result_seen.is_set():
                print(
                    f"bench: headline emitted; a later stage stalled >{deadline_s}s "
                    "(killed) — exiting 0 with the captured number",
                    file=sys.stderr,
                )
                raise SystemExit(0)
            print(
                f"bench stalled >{deadline_s}s (likely a wedged chip claim); retrying",
                file=sys.stderr,
            )
    raise SystemExit("bench stalled on all attempts")


if __name__ == "__main__":
    if "--inner" in sys.argv or os.environ.get("TOKENIZE_AUDIO_BENCH_WATCHDOG") == "0":
        main()
    else:
        watchdog()
