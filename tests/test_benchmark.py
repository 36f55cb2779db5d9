"""The benchmark CLIs are first-class package surfaces (VERDICT r3 #3):
pin that both run end-to-end on a tiny config and emit the one-JSON-line
contract the driver and README cite."""

import json

import pytest

from tests.mimi_fixtures import tiny_jax_config
from tokenize_audio_tpu.benchmark import run_engine_bench, run_pipeline_bench
from tokenize_audio_tpu.config import EngineConfig


def tiny_engine_cfg(**kw):
    return EngineConfig(
        batch_size=4,
        min_bucket_seconds=0.5,
        max_chunk_seconds=4.0,
        **kw,
    )


@pytest.mark.slow  # heavy compile load; full suite / CI only
def test_engine_bench_contract():
    emitted = []

    def on_headline(r):
        # the headline must be emitted BEFORE the secondary fused-16k stage
        # runs (a wedged fused compile once ate the deadline after the
        # headline was measured — bench.py streams this out immediately)
        emitted.append(("fused_16khz_x_realtime" in r["detail"], r))

    res = run_engine_bench(
        n_utts=6,
        passes=2,
        mimi_cfg=tiny_jax_config(),
        engine_cfg=tiny_engine_cfg(),
        on_headline=on_headline,
    )
    assert res["metric"] == "audio_hours_per_hour_per_chip"
    assert res["unit"] == "x_realtime"
    assert res["value"] > 0
    assert res["vs_baseline"] == pytest.approx(res["value"] / 50.0, rel=0.02)
    d = res["detail"]
    assert len(d["pass_x_realtime"]) == 2
    assert d["fused_16khz_x_realtime"] > 0
    assert 0 < d["bucket_efficiency"] <= 1
    json.dumps(res)  # one-JSON-line contract: serializable as-is
    [(fused_at_emit, emitted_dict)] = emitted
    assert not fused_at_emit  # emitted before the fused stage...
    assert emitted_dict is res  # ...and enriched in place afterwards


@pytest.mark.slow  # heavy compile load; full suite / CI only
def test_bench_watchdog_keeps_headline_when_late_stage_stalls(capsys):
    """bench.py's watchdog streams the child's stdout through and exits 0
    if the headline JSON landed before a later stage wedged past the
    deadline (the r4-early failure mode: 5/5 passes measured, fused stage
    stalled, number lost)."""
    import importlib.util
    import os as _os
    import sys as _sys

    spec = importlib.util.spec_from_file_location(
        "bench_root", _os.path.join(_os.path.dirname(__file__), "..", "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    headline_then_hang = (
        "import json,sys,time;"
        "print(json.dumps({'metric':'m','value':1.0,'unit':'x','vs_baseline':0}));"
        "sys.stdout.flush(); time.sleep(60)"
    )
    # generous deadline: a fresh python child can take seconds to start
    # on a loaded test machine, and the deadline only needs to be shorter
    # than the child's 60 s hang
    _os.environ["TOKENIZE_AUDIO_BENCH_DEADLINES"] = "10"
    try:
        with pytest.raises(SystemExit) as ei:
            bench.watchdog(cmd=[_sys.executable, "-c", headline_then_hang])
        assert ei.value.code == 0
        out = capsys.readouterr().out.strip().splitlines()
        assert json.loads(out[-1])["metric"] == "m"

        # and a child that never emits anything still stalls out non-zero
        with pytest.raises(SystemExit) as ei:
            bench.watchdog(cmd=[_sys.executable, "-c", "import time; time.sleep(60)"])
        assert ei.value.code == "bench stalled on all attempts"
    finally:
        del _os.environ["TOKENIZE_AUDIO_BENCH_DEADLINES"]


@pytest.mark.slow  # heavy compile load; full suite / CI only
def test_pipeline_bench_runs_full_path(tmp_path):
    """Tiny synthetic mirror through the WHOLE yodas2 path: tar extract,
    WAV decode, chunk slicing, encode, JSON serialize, local-hub upload —
    warm pass + measured pass, report well-formed."""
    res = run_pipeline_bench(
        subshards=2,
        audios=1,
        seconds=5.0,
        mimi_cfg=tiny_jax_config(),
        engine_cfg=tiny_engine_cfg(),
        work_root=str(tmp_path),
    )
    assert res["metric"] == "pipeline_audio_hours_per_hour_per_chip"
    assert res["value"] > 0
    d = res["detail"]
    assert d["subshards"] == 2
    assert d["chunks"] > 0
    assert d["transient_retries"] == 0
    assert d["warm_pass_seconds"] > 0
    # the measured pass's hub got every sub-shard's artifact
    hub_dir = tmp_path / "hub_m" / "data" / "en000"
    uploaded = sorted(p.name for p in hub_dir.glob("*.json"))
    assert uploaded == ["00000000.json", "00000001.json"]


@pytest.mark.slow  # heavy compile load; full suite / CI only
def test_pipeline_bench_source_rate_exercises_resample(tmp_path):
    """A non-24 kHz mirror (real YODAS2 tars are original-rate web audio)
    must route every file through the on-device resample stage — the cost
    the reference pays librosa for (yodas2-mimi/process_shard.py:188) and
    the 24 kHz default mirror never measures."""
    res = run_pipeline_bench(
        subshards=1,
        audios=2,
        seconds=5.0,
        source_rate=(16_000, 48_000),
        mimi_cfg=tiny_jax_config(),
        engine_cfg=tiny_engine_cfg(),
        work_root=str(tmp_path),
    )
    d = res["detail"]
    assert d["source_rates"] == [16_000, 48_000]
    assert d["chunks"] > 0 and res["value"] > 0
    # the measured pass decoded + resampled both files on device
    assert d["engine_stage_seconds"].get("resample", 0) > 0
    # codes still reached the hub: the full path works at source rate
    uploaded = list((tmp_path / "hub_m" / "data" / "en000").glob("*.json"))
    assert len(uploaded) == 1


def test_soak_contract(tmp_path):
    """run_soak loops whole pipeline volumes through ONE long-lived engine
    until the time budget elapses, reporting the sustained band and
    cumulative transient retries (VERDICT r3 #2's sustained-operation
    evidence, CPU-sized here)."""
    from tokenize_audio_tpu.benchmark import run_soak

    res = run_soak(
        minutes=0.001,  # at least one counted iteration, then stop
        subshards=1,
        audios=1,
        seconds=4.0,
        mimi_cfg=tiny_jax_config(),
        engine_cfg=tiny_engine_cfg(),
        work_root=str(tmp_path),
    )
    assert res["metric"] == "pipeline_soak_sustained"
    d = res["detail"]
    assert d["iterations"] >= 1
    assert d["rt_min"] <= res["value"] <= d["rt_max"]
    assert d["transient_retries"] == 0 and d["iteration_errors"] == []
    assert len(d["per_iteration"]) == d["iterations"]
    # iteration artifacts are cleaned as the soak goes (disk must not grow)
    assert not list(tmp_path.glob("hub_i*")) and not list(tmp_path.glob("work_i*"))
    json.dumps(res)


def test_soak_terminates_on_persistent_failure(tmp_path, monkeypatch):
    """A broken production path must make the soak FAIL, not loop forever
    chasing a first success: 3 consecutive failures with zero counted
    iterations raises instead of soaking."""
    import tokenize_audio_tpu.benchmark as B

    calls = []

    def always_broken(tmp, mirror, engine, tag, subshards):
        if tag == "warm":  # let the warm pass through so the loop is reached
            return 0.1, {"processed": subshards}
        calls.append(tag)
        raise OSError("disk full")

    monkeypatch.setattr(B, "_process_shard_once", always_broken)
    with pytest.raises(RuntimeError, match="no successful iterations"):
        B.run_soak(
            minutes=10.0,  # budget far from elapsing: the bail must trigger
            subshards=1,
            audios=1,
            seconds=4.0,
            mimi_cfg=tiny_jax_config(),
            engine_cfg=tiny_engine_cfg(),
            work_root=str(tmp_path),
        )
    assert len(calls) == 3  # exactly the consecutive-failure bail, no spin


def test_bench_claims_device_before_engine_build(tmp_path):
    """The 'device_claim' heartbeat must fire BEFORE engine construction
    (engine init device_puts params — the first device touch is where a
    tunneled claim wedges, and the watchdog post-mortem must not blame
    the 'params' stage for it)."""
    stages = []
    run_pipeline_bench(
        subshards=1,
        audios=1,
        seconds=4.0,
        mimi_cfg=tiny_jax_config(),
        engine_cfg=tiny_engine_cfg(),
        work_root=str(tmp_path),
        progress=stages.append,
    )
    assert stages.index("device_claim") < stages.index("params")
    assert "warm_pass" in stages and "measured_pass" in stages


def test_benchmark_cli_pipeline(tmp_path, capsys, monkeypatch):
    """python -m tokenize_audio_tpu.benchmark --pipeline prints exactly one
    JSON line on stdout (heartbeats go to stderr)."""
    import tokenize_audio_tpu.benchmark as B

    # keep the CLI test fast: patch the runner to the tiny config
    real = B.run_pipeline_bench
    monkeypatch.setattr(
        B,
        "run_pipeline_bench",
        lambda **kw: real(
            **{
                **kw,
                "mimi_cfg": tiny_jax_config(),
                "engine_cfg": tiny_engine_cfg(),
                "work_root": str(tmp_path),
            }
        ),
    )
    assert B.main(["--pipeline", "--subshards", "1", "--audios", "1", "--seconds", "4"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    res = json.loads(out[0])
    assert res["metric"] == "pipeline_audio_hours_per_hour_per_chip"

def test_soak_failed_iteration_still_cleans_artifacts(tmp_path, monkeypatch):
    """A FAILED soak iteration must not leak its hub_/work_/prog_ dirs —
    under disk pressure (the kind of failure a soak exists to surface) a
    leak per failed iteration would actively worsen the condition."""
    import os

    import tokenize_audio_tpu.benchmark as B

    def write_then_break(tmp, mirror, engine, tag, subshards):
        if tag == "warm":
            return 0.1, {"processed": subshards}
        for d in (f"hub_{tag}", f"work_{tag}", f"prog_{tag}"):
            os.makedirs(os.path.join(tmp, d), exist_ok=True)
        raise OSError("disk full mid-shard")

    monkeypatch.setattr(B, "_process_shard_once", write_then_break)
    with pytest.raises(RuntimeError, match="no successful iterations"):
        B.run_soak(
            minutes=10.0,
            subshards=1,
            audios=1,
            seconds=4.0,
            mimi_cfg=tiny_jax_config(),
            engine_cfg=tiny_engine_cfg(),
            work_root=str(tmp_path),
        )
    leaked = list(tmp_path.glob("hub_i*")) + list(tmp_path.glob("work_i*"))
    assert leaked == []


def test_soak_caps_error_log_and_backs_off(tmp_path, monkeypatch):
    """After one success, a persistent fast failure must not spin at
    failure speed for the whole budget nor grow the returned error list
    unboundedly: errors are capped at 100 (total in error_count) and each
    retry backs off."""
    import tokenize_audio_tpu.benchmark as B

    sleeps = []
    monkeypatch.setattr(B.time, "sleep", lambda s: sleeps.append(s))
    state = {"n": 0}

    def one_success_then_broken(tmp, mirror, engine, tag, subshards):
        if tag in ("warm", "i1"):
            return 0.1, {"processed": subshards}
        state["n"] += 1
        if state["n"] >= 150:  # stop the budget loop via monotonic patch
            clock["t"] += 10_000.0
        raise OSError("broken")

    clock = {"t": 0.0}
    real_monotonic = B.time.monotonic
    monkeypatch.setattr(
        B.time, "monotonic", lambda: real_monotonic() + clock["t"]
    )
    monkeypatch.setattr(B, "_process_shard_once", one_success_then_broken)
    res = B.run_soak(
        minutes=10.0,
        subshards=1,
        audios=1,
        seconds=4.0,
        mimi_cfg=tiny_jax_config(),
        engine_cfg=tiny_engine_cfg(),
        work_root=str(tmp_path),
    )
    d = res["detail"]
    assert d["iterations"] == 1
    assert d["error_count"] == state["n"] >= 150
    assert len(d["iteration_errors"]) == 100  # capped
    # the MOST RECENT error survives the cap (a failure mode that changes
    # late in a long soak must stay visible, not just counted)
    assert d["last_error"]["iter"] > d["iteration_errors"][-1]["iter"]
    assert len(sleeps) == state["n"]  # every post-success failure backs off
    assert max(sleeps) == 30.0  # and the backoff is bounded
    # the backoff is clamped to the remaining budget: once the patched
    # clock jumped past budget_end, the final sleep must be ~0 — an
    # expired soak exits instead of oversleeping up to 30 s
    assert sleeps[-1] == 0.0


def test_build_mirror_rejects_chunkless_seconds(tmp_path):
    """seconds <= 2 would emit zero chunks while still counting the full
    audio — a silently bogus x_realtime; it must be a usage error."""
    from tokenize_audio_tpu.benchmark import build_mirror

    with pytest.raises(ValueError, match="seconds"):
        build_mirror(str(tmp_path), "en000", 1, 1, seconds=2.0)


def test_seconds_arg_is_a_usage_error():
    """--seconds 2 must report an argparse usage error (like --passes and
    --source-rate), not the library guard's deep ValueError traceback."""
    import argparse

    from tokenize_audio_tpu.benchmark import _seconds_arg

    assert _seconds_arg("4.5") == 4.5
    for bad in ("2", "2.0", "-1", "abc"):
        with pytest.raises(argparse.ArgumentTypeError):
            _seconds_arg(bad)


def test_engine_bench_rejects_zero_passes():
    """passes < 1 must fail at entry, not with a max()-on-empty ValueError
    after minutes of device claim + warmup."""
    with pytest.raises(ValueError, match="passes"):
        run_engine_bench(passes=0, mimi_cfg=tiny_jax_config())


def test_source_rate_arg_parsing():
    """--source-rate tolerates whitespace/trailing commas and rejects
    garbage as a usage error, not a deep int() traceback."""
    import argparse

    from tokenize_audio_tpu.benchmark import _rates_arg

    assert _rates_arg("24000") == 24000
    assert _rates_arg("16000, 48000") == (16000, 48000)
    assert _rates_arg("16000,") == 16000
    for bad in ("", ",", "abc", "16000,-1", "0"):
        with pytest.raises(argparse.ArgumentTypeError):
            _rates_arg(bad)


def test_benchmark_cli_keeps_headline_when_fused_stage_raises(monkeypatch, capsys):
    """The packaged CLI must not lose an already-measured headline to a
    fused-stage failure (bench.py's wrapper got this protection first; the
    module CLI is what OPERATIONS points operators at)."""
    import tokenize_audio_tpu.benchmark as B

    headline = {"metric": "audio_hours_per_hour_per_chip", "value": 1.0}

    def fake_bench(**kw):
        kw["on_headline"](headline)
        raise RuntimeError("fused stage wedged")

    monkeypatch.setattr(B, "run_engine_bench", fake_bench)
    with pytest.raises(RuntimeError, match="fused stage wedged"):
        B.main([])
    out = capsys.readouterr().out.strip().splitlines()
    assert json.loads(out[-1]) == headline


@pytest.mark.slow  # heavy compile load; full suite / CI only
def test_compare_mode_same_chunk_set(tmp_path):
    """run_compare times encode_batch over the EXACT chunks the pipeline
    encodes, then the full path over the same mirror, in one process — the
    only fabric-noise-immune way to measure the pipeline-vs-engine gap."""
    from tokenize_audio_tpu.benchmark import run_compare

    res = run_compare(
        subshards=2,
        audios=1,
        seconds=5.0,
        passes=2,
        mimi_cfg=tiny_jax_config(),
        engine_cfg=tiny_engine_cfg(),
        work_root=str(tmp_path),
    )
    assert res["metric"] == "pipeline_vs_engine_ratio"
    assert 0 < res["value"] <= 1.5  # host work can only slow it down
    d = res["detail"]
    assert d["chunks"] > 0
    assert len(d["engine_wall_seconds"]) == 2
    assert len(d["pipeline_wall_seconds"]) == 2
    # the per-stage table must carry the host stages the gap hides in
    for k in ("host_decode", "host_serialize", "host_extract", "hub_upload"):
        assert k in d["pipeline_stage_seconds"], d["pipeline_stage_seconds"]
    json.dumps(res)


@pytest.mark.slow  # heavy compile load; full suite / CI only
def test_pipeline_bench_mp3_container(tmp_path):
    """container="mp3" routes the whole path through real lame-encoded
    mp3 payloads — the Emilia/Common Voice decode class
    (emilia-mimi/process_shard.py:473-537); throughput-only (mp3 is
    lossy), every sub-shard must still reach the hub."""
    res = run_pipeline_bench(
        subshards=1,
        audios=2,
        seconds=5.0,
        container="mp3",
        mimi_cfg=tiny_jax_config(),
        engine_cfg=tiny_engine_cfg(),
        work_root=str(tmp_path),
    )
    d = res["detail"]
    assert d["container"] == "mp3"
    assert d["chunks"] > 0 and res["value"] > 0
    assert d["engine_stage_seconds"].get("host_decode", 0) > 0
    uploaded = list((tmp_path / "hub_m" / "data" / "en000").glob("*.json"))
    assert len(uploaded) == 1
