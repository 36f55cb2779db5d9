"""Shared scaffolding for the within-process interleaved A/B probes.

Measurement discipline (CLAUDE.md): the tunneled fabric swings +-40%
cross-run, so every decision-grade comparison builds all configurations
in ONE process, interleaves them within every timing round, and decides
on medians. The probes (fetch_pack_probe, growth_probe, ...) share the
workload and the loop; only the engine configurations differ.
"""

import time

import numpy as np


def bench_audios(utts: int = 192, seed: int = 0):
    """The bench.py workload shape: lognormal 0.8-59 s utterances as int16
    PCM (the production wire format). Returns (audios, total_seconds)."""
    rng = np.random.default_rng(seed)
    lengths_s = np.clip(rng.lognormal(mean=1.9, sigma=0.8, size=utts), 0.8, 59.0)
    audios = [
        (rng.standard_normal(int(s * 24_000)) * 0.3 * 32767).astype(np.int16)
        for s in lengths_s
    ]
    return audios, sum(len(a) for a in audios) / 24_000.0


def warm_and_check_equal(engines: dict, audios):
    """Warm every engine on the workload and assert all emit identical
    codes (the formats/configs under test must be pure transport/layout)."""
    ref = None
    for name, eng in engines.items():
        got = eng.encode_batch(audios)
        if ref is None:
            ref = got
        else:
            assert all((a == b).all() for a, b in zip(ref, got)), name
    return ref


def interleaved_rounds(engines: dict, audios, total_s: float, rounds: int):
    """Alternate every engine within each round; returns
    ({name: [x_realtime per round]}, {name: last round's stage seconds})."""
    from tokenize_audio_tpu.engine.metrics import EngineStats

    results = {name: [] for name in engines}
    stages = {}
    for r in range(rounds):
        for name, eng in engines.items():
            eng.stats = EngineStats()
            t0 = time.perf_counter()
            eng.encode_batch(audios)
            results[name].append(total_s / (time.perf_counter() - t0))
            stages[name] = {
                k: round(v, 3) for k, v in eng.stats.stage_seconds.items()
            }
        print(
            f"round {r}: "
            + "  ".join(f"{n}={results[n][-1]:.0f}x" for n in results),
            flush=True,
        )
    return results, stages
