"""Shared CLI plumbing for the dataset processors: engine flags + bootstrap."""

from __future__ import annotations

import argparse
from typing import Optional

from tokenize_audio_tpu.config import EngineConfig
from tokenize_audio_tpu.engine import MimiEncoderEngine


def _depth_arg(v: str):
    """--pipeline-depth: 'auto', 'auto-data', or an int >= 1 — validated
    at parse time (a typo'd 'aut0' or a depth of 0 should be a usage
    error, not a traceback from deep inside engine construction)."""
    if v in ("auto", "auto-data"):
        return v
    try:
        iv = int(v)
    except ValueError:
        raise argparse.ArgumentTypeError(
            f"expected an integer or 'auto'/'auto-data', got {v!r}"
        )
    if iv < 1:
        raise argparse.ArgumentTypeError(f"depth must be >= 1, got {iv}")
    return iv


def add_engine_args(ap: argparse.ArgumentParser, batch_size: int = 16) -> None:
    ap.add_argument("--params", default=None, help="mimi safetensors checkpoint")
    ap.add_argument("--batch-size", type=int, default=batch_size)
    ap.add_argument("--samples-per-batch", type=int, default=None)
    ap.add_argument("--max-chunk-seconds", type=float, default=60.0)
    ap.add_argument(
        "--growth",
        type=float,
        default=None,
        help="bucket-lattice growth factor (default EngineConfig.bucket_growth; "
        "finer = less padding waste but more compiled shapes — the persistent "
        "compile cache makes extra shapes one-time per machine)",
    )
    ap.add_argument(
        "--fast",
        action="store_true",
        help="bfloat16 compute (~2.6x raw throughput; NOT a parity mode — "
        "measured ~33%% code match on realistic codebooks, see NOTES.md)",
    )
    ap.add_argument(
        "--precision",
        default="highest",
        choices=["highest", "high"],
        help="f32 MXU emulation level: highest = bit-exact parity (default); "
        "high = 3-pass, 1.35x compute at ~89%% code match (NOTES.md r3) — "
        "a middle throughput mode between parity and --fast",
    )
    ap.add_argument("--rvq-backend", default="xla", choices=["xla", "pallas"])
    ap.add_argument("--seanet-backend", default="xla", choices=["xla", "pallas"])
    ap.add_argument(
        "--code-transfer-format",
        default=None,
        choices=["padded", "packed", "compact", "auto", "auto-data"],
        help="device->host code wire format (default EngineConfig default; "
        "see config.py — 'compact' fetches only packed valid frames). "
        "'auto' probes packed vs padded on THIS fabric with an interleaved "
        "A/B at startup and keeps the fastest (the ranking is "
        "fabric-dependent: packed wins on latency-bound tunnels). "
        "'compact' is a retired experiment kept for manual selection only "
        "— it lost every measured A/B, NOTES r3/r4. 'auto-data' defers the "
        "probe to the first REAL batch and times the shard's own "
        "utterances instead of a synthetic workload",
    )
    ap.add_argument(
        "--pipeline-depth",
        default=None,
        type=_depth_arg,
        help="in-flight device batches (int >= 1; engine default 18). "
        "'auto' probes {6,12,18} on a synthetic workload at startup; "
        "'auto-data' probes on the first real batch. Depth hides "
        "per-dispatch RTTs — worth +30%% on a tunneled fabric, ~nothing "
        "locally",
    )
    ap.add_argument(
        "--drain-policy",
        default=None,
        choices=["fifo", "ready", "threaded", "auto"],
        help="in-flight batch collection order (default EngineConfig "
        "default): fifo = dispatch order; ready = collect whichever "
        "handle is ready first; threaded = a small fetch pool overlaps "
        "the blocking per-batch RTTs themselves. Bit- and order-identical "
        "in every mode (pure transport scheduling). 'auto' runs the "
        "interleaved provisioning probe — the ranking is fabric-state-"
        "dependent (r5 receipt: ready/threaded +21/+55%% in one "
        "fetch-bound window, fifo ahead in another)",
    )
    ap.add_argument(
        "--autotune-seconds",
        type=float,
        default=40.0,
        help="with an auto/auto-data format or depth: seconds of audio "
        "per probe pass (smaller = faster startup, noisier pick)",
    )
    ap.add_argument(
        "--profile-dir",
        default=None,
        help="capture a JAX profiler trace of the whole run into this "
        "directory (view with XProf/TensorBoard) — the per-op tracing "
        "facility the reference lacks entirely (SURVEY §5)",
    )
    ap.add_argument(
        "--warmup",
        action="store_true",
        help="precompile the steady-state program set (one full-batch "
        "encode per bucket, for the 24/16/48 kHz lattices) before "
        "processing — with the persistent compile cache this is one-time "
        "per machine, so run it during provisioning instead of paying "
        "compiles mid-shard",
    )
    ap.add_argument(
        "--warmup-tails",
        action="store_true",
        help="with --warmup: also precompile every tail-ladder batch size "
        "(the COMPLETE program set, ~10x the compiles) — worth it when "
        "provisioning a fleet against a remote-compile fabric",
    )
    ap.add_argument(
        "--long-audio-policy",
        default="split",
        choices=["split", "stream"],
        help="split = reference-parity 60s cuts; stream = exact codes via "
        "the streaming encoder up to 320s",
    )


def engine_from_args(
    args, num_codebooks: Optional[int] = None, **engine_overrides
) -> MimiEncoderEngine:
    """Build the encode engine from the shared flags (compile cache on)."""
    import logging

    from tokenize_audio_tpu.mimi import MimiConfig
    from tokenize_audio_tpu.mimi.weights import params_from_safetensors, random_params
    from tokenize_audio_tpu.utils import enable_compile_cache

    enable_compile_cache()
    cfg = MimiConfig(
        compute_dtype="bfloat16" if getattr(args, "fast", False) else "float32",
        matmul_precision=getattr(args, "precision", "highest"),
        rvq_backend=getattr(args, "rvq_backend", "xla"),
        seanet_backend=getattr(args, "seanet_backend", "xla"),
    )
    if args.params:
        params = params_from_safetensors(args.params, cfg)
    else:
        logging.getLogger(__name__).warning(
            "no --params given; using seeded random weights"
        )
        params = random_params(cfg)
    if getattr(args, "growth", None) is not None:
        engine_overrides.setdefault("bucket_growth", args.growth)
    fmt_arg = getattr(args, "code_transfer_format", None)
    if fmt_arg is not None and fmt_arg not in ("auto", "auto-data"):
        engine_overrides.setdefault("code_transfer_format", fmt_arg)
    drain_arg = getattr(args, "drain_policy", None)
    if drain_arg is not None and drain_arg != "auto":
        engine_overrides.setdefault("drain_policy", drain_arg)
    depth_arg = getattr(args, "pipeline_depth", None)
    depth_kw = {}
    if depth_arg is not None and depth_arg not in ("auto", "auto-data"):
        depth_kw["pipeline_depth"] = int(depth_arg)
    ecfg = EngineConfig(
        batch_size=args.batch_size,
        samples_per_batch=getattr(args, "samples_per_batch", None),
        max_chunk_seconds=getattr(args, "max_chunk_seconds", 60.0),
        long_audio_policy=getattr(args, "long_audio_policy", "split"),
        **engine_overrides,
    )
    if getattr(args, "profile_dir", None):
        import atexit

        import jax

        jax.profiler.start_trace(args.profile_dir)

        def _stop_trace():
            try:
                jax.profiler.stop_trace()
            except RuntimeError:
                pass  # already stopped explicitly

        atexit.register(_stop_trace)
    engine = MimiEncoderEngine(params, cfg, ecfg, num_codebooks=num_codebooks, **depth_kw)

    def run_warmup() -> None:
        # warm every standard corpus rate's lattice: 24 kHz (YODAS2/
        # Emilia/LibriTTS), 16 kHz (LibriSpeech/MLS — the fused-resample
        # SOURCE-rate lattice is a different program set), 48 kHz (Common
        # Voice). Warming only 24 kHz would leave a 16 kHz shard paying
        # every compile mid-run, defeating the flag.
        tails = getattr(args, "warmup_tails", False)
        n = sum(
            engine.warmup(sr=sr, include_tails=tails)
            for sr in (24_000, 16_000, 48_000)
        )
        logging.getLogger(__name__).info("warmed %d bucket programs", n)

    warmup = getattr(args, "warmup", False)
    if warmup:
        # warm BEFORE the probe so steady-state programs of the default
        # format never contaminate probe timings as cold compiles
        run_warmup()
    probe_s = getattr(args, "autotune_seconds", 40.0)
    if fmt_arg == "auto" or depth_arg == "auto" or drain_arg == "auto":
        fmt_before = engine.engine_cfg.code_transfer_format
        if fmt_arg == "auto":
            engine.autotune_transfer(seconds=probe_s)
        if depth_arg == "auto":
            engine.autotune_pipeline_depth(seconds=probe_s)
        if drain_arg == "auto":
            engine.autotune_drain_policy(seconds=probe_s)
        if warmup and engine.engine_cfg.code_transfer_format != fmt_before:
            # the probe only warmed the chosen format's shapes for ITS
            # durations; re-warm the full lattices so the first real
            # shard stays compile-free (ADVICE r3)
            run_warmup()
    if fmt_arg == "auto-data" or depth_arg == "auto-data":
        fmt_before_deferred = engine.engine_cfg.code_transfer_format

        def _rewarm_if_format_switched() -> None:
            # same contract as the startup-'auto' path above: if the
            # deferred probe switches wire formats, the startup --warmup
            # only covered the OLD format's lattices — re-warm so the
            # rest of the shard stays compile-free instead of paying
            # each bucket's remote compile lazily mid-run
            if warmup and engine.engine_cfg.code_transfer_format != fmt_before_deferred:
                run_warmup()

        engine.request_autotune(
            transfer=fmt_arg == "auto-data",
            depth=depth_arg == "auto-data",
            seconds=probe_s,
            on_complete=_rewarm_if_format_switched,
        )
    return engine
