"""Child process for the BPE-sampler SIGKILL chaos test
(test_sampler_chaos).

Runs CodeSampler over a seeded 3-shard x 60-sub-shard code-JSON hub with
the append-only fsync'd progress grain
(codec-bpe/sample_yodas2_codes_from_hf.py:266-302 equivalent). Prints
READY before sampling starts (the parent waits for it before arming the
kill timer) and DONE <report> on completion. Run only via the test
driver. CPU-only: no engine, no jax.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHARDS = {f"en{n:03d}": [f"{i:08d}" for i in range(60)] for n in range(3)}


def build_source(src):
    """Seeded code-JSON tree; idempotent across reruns."""
    import numpy as np

    rng = np.random.default_rng(13)
    tmp = os.path.join(src.root, "tmp_build.json")
    for shard, subs in SHARDS.items():
        for sub in subs:
            entries = []
            for a in range(2):
                codes = {
                    f"c{c}": rng.integers(0, 2048, size=(12, int(rng.integers(8, 40)))).tolist()
                    for c in range(2)
                }
                entries.append({"audio_id": f"{shard}-{sub}-{a}", "codes": codes})
            with open(tmp, "w") as f:
                json.dump(entries, f)
            src.upload_file(tmp, f"data/{shard}/{sub}.json")
    os.unlink(tmp)


def main():
    srcdir, outdir = sys.argv[1:3]
    from tokenize_audio_tpu.bpe.sampler import CodeSampler, pick_subshards
    from tokenize_audio_tpu.hub import LocalHub

    src = LocalHub(srcdir)
    build_source(src)
    picks = pick_subshards(SHARDS, per_shard=40, seed=21)
    print("READY", flush=True)
    rep = CodeSampler(src, outdir, num_codebooks=8).sample(picks)
    print("DONE " + json.dumps(rep), flush=True)


if __name__ == "__main__":
    main()
