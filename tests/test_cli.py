"""Top-level codec CLI (python -m tokenize_audio_tpu)."""

import json
import os

import numpy as np
import pytest

from tests.mimi_fixtures import make_oracle, tiny_hf_config
from tokenize_audio_tpu.__main__ import main
from tokenize_audio_tpu.io import read_wav, write_wav


def test_info(tmp_path, rng, capsys):
    p = str(tmp_path / "a.wav")
    write_wav(p, (rng.standard_normal(12_000) * 0.2).astype(np.float32), 24_000)
    assert main(["info", p]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["sample_rate"] == 24_000 and out["samples"] == 12_000
    assert out["frames_at_12_5hz"] == 7


def test_engine_from_args_flag_plumbing(rng):
    """The shared engine flags reach the configs they claim to control."""
    import argparse

    from tokenize_audio_tpu.cli import add_engine_args, engine_from_args

    ap = argparse.ArgumentParser()
    add_engine_args(ap)
    args = ap.parse_args(
        [
            "--precision", "high",
            "--growth", "1.15",
            "--code-transfer-format", "packed",
            "--batch-size", "4",
        ]
    )
    eng = engine_from_args(args)
    assert eng.cfg.matmul_precision == "high"
    assert eng.engine_cfg.bucket_growth == 1.15
    assert eng.engine_cfg.code_transfer_format == "packed"
    # and the engine actually encodes with that combination
    codes = eng.encode_batch([(rng.standard_normal(2000) * 0.3).astype(np.float32)])
    assert codes[0].shape == (8, 2)


def test_warmup_tails_flag_plumbing(monkeypatch):
    """--warmup [--warmup-tails] warms all three corpus-rate lattices with
    the requested tail coverage (warmup itself is tested in test_engine)."""
    import argparse

    from tokenize_audio_tpu.cli import add_engine_args, engine_from_args
    from tokenize_audio_tpu.engine import MimiEncoderEngine

    calls = []
    monkeypatch.setattr(
        MimiEncoderEngine,
        "warmup",
        lambda self, sr=24_000, include_tails=False: (
            calls.append((sr, include_tails)),
            0,
        )[1],
    )
    ap = argparse.ArgumentParser()
    add_engine_args(ap)
    engine_from_args(ap.parse_args(["--warmup", "--warmup-tails"]))
    assert calls == [(24_000, True), (16_000, True), (48_000, True)]
    calls.clear()
    engine_from_args(ap.parse_args(["--warmup"]))
    assert calls == [(24_000, False), (16_000, False), (48_000, False)]


def test_profile_dir_captures_trace(tmp_path, rng):
    import argparse
    import glob

    import jax

    from tokenize_audio_tpu.cli import add_engine_args, engine_from_args

    ap = argparse.ArgumentParser()
    add_engine_args(ap)
    trace_dir = str(tmp_path / "trace")
    args = ap.parse_args(["--profile-dir", trace_dir, "--batch-size", "1"])
    eng = engine_from_args(args)
    eng.encode_batch([(rng.standard_normal(2000) * 0.3).astype(np.float32)])
    jax.profiler.stop_trace()  # the CLI registers this via atexit
    found = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    assert found, f"no trace written under {trace_dir}"


def test_encode_decode_roundtrip(tmp_path, rng, monkeypatch, capsys):
    # patch the param loader so the CLI runs the tiny oracle
    import tokenize_audio_tpu.__main__ as m

    _, params, cfg = make_oracle(tiny_hf_config())
    monkeypatch.setattr(
        "tokenize_audio_tpu.mimi.weights.random_params", lambda c, seed=0: params
    )
    monkeypatch.setattr("tokenize_audio_tpu.mimi.MimiConfig", lambda: cfg)

    wav_path = str(tmp_path / "in.wav")
    write_wav(wav_path, (rng.standard_normal(4000) * 0.2).astype(np.float32), 24_000)
    codes_path = str(tmp_path / "codes.txt")
    assert main(["encode", wav_path, "-o", codes_path]) == 0
    s = open(codes_path).read().strip()
    assert len(s) == 8 * 3  # 3 frames x 8 books

    out_path = str(tmp_path / "out.wav")
    assert main(["decode", codes_path, "-o", out_path]) == 0
    audio, sr = read_wav(out_path)
    assert sr == 24_000 and audio.shape == (3 * 1920,)


def test_every_documented_cli_exists():
    """Every `python -m tokenize_audio_tpu...` command the docs promise
    (MIGRATION/OPERATIONS/README) must be a real module with a main() —
    the migration table once promised a surgery CLI that didn't exist."""
    import importlib
    import os
    import re

    root = os.path.join(os.path.dirname(__file__), "..")
    mods = set()
    for doc in ("MIGRATION.md", "OPERATIONS.md", "README.md"):
        with open(os.path.join(root, doc)) as f:
            mods |= set(re.findall(r"python -m (tokenize_audio_tpu[\w.]*)", f.read()))
    assert len(mods) >= 15, sorted(mods)  # the docs name the full CLI surface
    for name in sorted(mods):
        mod = importlib.import_module(
            name + ".__main__" if name == "tokenize_audio_tpu" else name
        )
        assert hasattr(mod, "main"), f"{name} has no main()"


@pytest.mark.slow  # heavy compile load; full suite / CI only
def test_pipeline_depth_and_autodata_flag_plumbing(monkeypatch):
    """--pipeline-depth N reaches the engine; 'auto' runs the depth probe
    at startup; 'auto-data' + --code-transfer-format auto-data defer the
    probes to the first real batch via request_autotune."""
    import argparse

    from tokenize_audio_tpu.cli import add_engine_args, engine_from_args
    from tokenize_audio_tpu.engine import MimiEncoderEngine

    ap = argparse.ArgumentParser()
    add_engine_args(ap)

    eng = engine_from_args(ap.parse_args(["--pipeline-depth", "5"]))
    assert eng.pipeline_depth == 5

    calls = {}
    monkeypatch.setattr(
        MimiEncoderEngine,
        "autotune_pipeline_depth",
        lambda self, **kw: calls.setdefault("depth", kw) or 7,
    )
    monkeypatch.setattr(
        MimiEncoderEngine,
        "autotune_transfer",
        lambda self, **kw: calls.setdefault("transfer", kw) or "packed",
    )
    engine_from_args(
        ap.parse_args(["--pipeline-depth", "auto", "--autotune-seconds", "2.5"])
    )
    assert calls["depth"]["seconds"] == 2.5 and "transfer" not in calls

    eng = engine_from_args(
        ap.parse_args(
            ["--pipeline-depth", "auto-data", "--code-transfer-format", "auto-data"]
        )
    )
    pa = eng._pending_autotune
    assert pa and pa["transfer"] and pa["depth"]


def test_warmup_reruns_after_autotune_format_switch(monkeypatch):
    """--warmup + --code-transfer-format auto: if the probe switches the
    format, the full lattices are re-warmed for the CHOSEN format so the
    first shard stays compile-free (ADVICE r3)."""
    import argparse

    from tokenize_audio_tpu.cli import add_engine_args, engine_from_args
    from tokenize_audio_tpu.engine import MimiEncoderEngine

    warm_calls = []
    monkeypatch.setattr(
        MimiEncoderEngine,
        "warmup",
        lambda self, sr=24_000, include_tails=False: warm_calls.append(sr) or 0,
    )

    def fake_tune(self, **kw):
        self._set_transfer_format("padded")  # switch away from the default
        return "padded"

    monkeypatch.setattr(MimiEncoderEngine, "autotune_transfer", fake_tune)
    ap = argparse.ArgumentParser()
    add_engine_args(ap)
    engine_from_args(ap.parse_args(["--warmup", "--code-transfer-format", "auto"]))
    # one full warmup before the probe + one re-warm after the switch
    assert warm_calls == [24_000, 16_000, 48_000] * 2


def test_warmup_reruns_after_deferred_autodata_format_switch(monkeypatch, rng):
    """--warmup + --code-transfer-format auto-data: the probe runs on the
    FIRST real batch; if it switches formats there, the re-warm contract
    must still hold (via request_autotune's on_complete hook) — startup
    warmed only the OLD format's lattices."""
    import argparse

    from tests.mimi_fixtures import tiny_jax_config
    from tokenize_audio_tpu.cli import add_engine_args, engine_from_args
    from tokenize_audio_tpu.engine import MimiEncoderEngine

    warm_calls = []
    monkeypatch.setattr(
        MimiEncoderEngine,
        "warmup",
        lambda self, sr=24_000, include_tails=False: warm_calls.append(sr) or 0,
    )

    def fake_tune(self, **kw):
        self._set_transfer_format("padded")  # switch away from the default
        return "padded"

    monkeypatch.setattr(MimiEncoderEngine, "autotune_transfer", fake_tune)
    # engine_from_args builds a full-size MimiConfig; swap in the tiny dims
    # (build the tiny config BEFORE patching — tiny_jax_config resolves the
    # class through the module attribute being patched)
    tiny_cfg = tiny_jax_config()
    monkeypatch.setattr("tokenize_audio_tpu.mimi.MimiConfig", lambda **kw: tiny_cfg)
    ap = argparse.ArgumentParser()
    add_engine_args(ap)
    eng = engine_from_args(
        ap.parse_args(
            ["--warmup", "--code-transfer-format", "auto-data", "--batch-size", "2"]
        )
    )
    assert warm_calls == [24_000, 16_000, 48_000]  # startup warm only so far
    audio = (rng.standard_normal(6000) * 0.3).astype(np.float32)
    eng.encode_batch([audio])  # first real batch triggers probe + re-warm
    assert warm_calls == [24_000, 16_000, 48_000] * 2


def test_pipeline_depth_arg_validation():
    """--pipeline-depth rejects typos and non-positive ints at parse time
    with a usage error, not a traceback from engine construction."""
    import argparse

    from tokenize_audio_tpu.cli import add_engine_args

    ap = argparse.ArgumentParser()
    add_engine_args(ap)
    for bad in ("aut0", "0", "-3", "2.5"):
        with pytest.raises(SystemExit):  # argparse usage error
            ap.parse_args(["--pipeline-depth", bad])
    assert ap.parse_args(["--pipeline-depth", "7"]).pipeline_depth == 7
    assert ap.parse_args(["--pipeline-depth", "auto"]).pipeline_depth == "auto"
