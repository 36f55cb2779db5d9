"""The real-checkpoint qualification kit (VERDICT r4 #4): push-button
parity qualification, tested here against the random oracle stand-in so
the kit is proven end-to-end before real weights are ever reachable."""

import json

import numpy as np
import pytest

from tests.mimi_fixtures import make_oracle, tiny_hf_config
from tokenize_audio_tpu.config import EngineConfig
from tokenize_audio_tpu.qualify import run_qualification, to_markdown


@pytest.fixture(scope="module")
def tiny_oracle():
    return make_oracle(tiny_hf_config())


def small_engine_cfg():
    return EngineConfig(batch_size=4, min_bucket_seconds=0.5, max_chunk_seconds=4.0)


def test_qualification_passes_on_oracle(tiny_oracle):
    model, _, _ = tiny_oracle
    rep = run_qualification(
        model=model,
        audio_seeds=(0, 1),
        n_utts=4,
        max_seconds=2.0,
        engine_cfg=small_engine_cfg(),
        bf16=True,
    )
    assert rep["passed"] is True
    c = rep["checks"]
    assert c["conversion"]["ok"] and c["conversion"]["params"] > 0
    assert c["per_layer"]["ok"]
    assert c["per_layer"]["seanet_max_abs_dev"] < 2e-4
    e = c["exact_codes"]
    assert e["frames"] > 0 and e["non_tie_flips"] == 0
    # every residual flip (if any) is a measured argmin tie
    assert all(f["rel_margin"] < 1e-5 for f in e["flips"])
    assert 0 <= c["bf16_fast_mode"]["code_match_vs_f32"] <= 1
    assert rep["value"] == e["frame_exact"]
    json.dumps(rep)  # report must serialize as-is
    md = to_markdown(rep)
    assert "PASS" in md and "exact_codes" in md


def test_qualification_gates_on_real_disagreement(tiny_oracle):
    """Corrupt one codebook centroid: the sweep must record NON-tie flips
    and fail the qualification (a real parity break can't pass as ties)."""
    model, params, cfg = tiny_oracle
    import copy

    bad = copy.deepcopy(params)
    # nudge the semantic codebook so argmins genuinely move
    bad["rvq"]["semantic"]["embed"] = (
        np.asarray(bad["rvq"]["semantic"]["embed"]) * 1.5 + 0.05
    )
    rep = run_qualification(
        model=model,
        params=bad,
        cfg=cfg,
        audio_seeds=(0,),
        n_utts=4,
        max_seconds=2.0,
        engine_cfg=small_engine_cfg(),
        bf16=False,
    )
    assert rep["passed"] is False
    assert rep["checks"]["exact_codes"]["non_tie_flips"] > 0
    md = to_markdown(rep)
    assert "FAIL" in md


def test_qualify_cli_oracle_mode(tmp_path, monkeypatch, capsys):
    """The CLI surface: --oracle-seed runs the whole kit and writes the
    JSON + markdown reports (tiny oracle patched in to keep it CPU-fast)."""
    import tokenize_audio_tpu.qualify as Q

    monkeypatch.setattr(
        Q, "_random_oracle", lambda seed: make_oracle(tiny_hf_config(), seed=seed)[0]
    )
    out = tmp_path / "rep.json"
    out_md = tmp_path / "rep.md"
    rc = Q.main(
        [
            "--oracle-seed",
            "0",
            "--audio-seeds",
            "0",
            "--utterances",
            "3",
            "--max-seconds",
            "2",
            "--no-bf16",
            "--out",
            str(out),
            "--out-md",
            str(out_md),
        ]
    )
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["metric"] == "qualification_frame_exact"
    assert summary["passed"] is True
    full = json.loads(out.read_text())
    assert full["source"] == "oracle_seed:0"
    assert "exact_codes" in full["checks"]
    assert "qualification" in out_md.read_text()
