"""Child process for the multi-process slice-DP test (test_multiprocess_dp).

Each child joins a jax.distributed CPU cluster (2 processes x 2 local
virtual devices = 4 global devices), then:

  1. helpers path: pushes its host-local rows through
     host_local_to_global -> mimi.model.encode -> local_rows;
  2. engine path: MimiEncoderEngine(mesh=global mesh) with the full
     utterance list (SPMD-consistent planning; each process materializes
     only its devices' addressable shards — engine._device_batch
     multiprocess branch), plus a dp<process_count tp-spanning mesh.

Results are saved to --out for the parent to diff against its own
single-process encode. Run only via the test driver.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--local-devices", type=int, default=2)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={args.local_devices} "
        + os.environ.get("XLA_FLAGS", "")
    )
    import jax

    # the environment's sitecustomize force-selects the axon TPU platform;
    # plain env vars do not override it (CLAUDE.md)
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        args.coordinator, num_processes=args.num_processes, process_id=args.process_id
    )
    assert jax.process_count() == args.num_processes
    assert len(jax.devices()) == args.num_processes * args.local_devices

    import numpy as np

    from tests.mimi_fixtures import tiny_jax_config
    from tokenize_audio_tpu.config import EngineConfig
    from tokenize_audio_tpu.engine import MimiEncoderEngine
    from tokenize_audio_tpu.mimi.model import encode
    from tokenize_audio_tpu.mimi.weights import random_params
    from tokenize_audio_tpu.parallel import multihost
    from tokenize_audio_tpu.parallel.mesh import make_mesh, replicate_params

    cfg = tiny_jax_config()
    params = random_params(cfg, seed=0)  # deterministic: identical in all procs
    mesh = multihost.global_mesh()  # dp = all 4 global devices
    assert mesh.shape["data"] == args.num_processes * args.local_devices

    # ---- helpers path: raw sharded encode of a fixed padded batch --------
    rng = np.random.default_rng(7)
    spf = cfg.samples_per_frame
    B, T = 8, 4 * spf
    full = (rng.standard_normal((B, T)) * 0.3).astype(np.float32)
    valid = np.array([T, 100, 2 * spf, 3 * spf - 5, T, spf, 2000, T - 1], dtype=np.int32)

    s, e = multihost.process_span(B)
    g = multihost.host_local_to_global(full[s:e], mesh)
    vg = multihost.host_local_to_global(valid[s:e], mesh)
    dparams = replicate_params(random_params(cfg, seed=0), mesh)
    codes, v12 = encode(dparams, cfg, g, vg)
    local = multihost.local_rows(codes)
    np.save(
        os.path.join(args.out, f"helpers_p{args.process_id}.npy"),
        local,
        allow_pickle=False,
    )

    # ---- engine path: full list in, full codes out, sharded compute ------
    # batch_size must divide the data axis; size it to the global device
    # count so the same child works at 2x2 and 4x2 cluster shapes
    n_dev = args.num_processes * args.local_devices
    engine = MimiEncoderEngine(
        params,
        cfg,
        EngineConfig(batch_size=max(4, n_dev), min_bucket_seconds=0.25, max_chunk_seconds=2.0),
        mesh=mesh,
    )
    audios = [full[i, : valid[i]] for i in range(B)]
    got = engine.encode_batch(audios)
    np.savez(
        os.path.join(args.out, f"engine_p{args.process_id}.npz"),
        **{str(i): c for i, c in enumerate(got)},
    )

    # ---- tp-spanning-hosts path: dp < process_count -----------------------
    # (2 procs: dp=1 tp=4; 4 procs: dp=2 tp=4). Batch sizes must round to
    # lcm(dp, process_count) — rounding only to dp would hand process_span
    # a batch it cannot split evenly and silently drop the remainder rows
    # (r3 review finding). An ODD 3-utterance list forces tail groups whose
    # raw sizes (1-3) are not multiples of the process count.
    tp_mesh = make_mesh(dp=n_dev // 4, tp=4)
    teng = MimiEncoderEngine(
        params,
        cfg,
        EngineConfig(batch_size=max(4, n_dev), min_bucket_seconds=0.25, max_chunk_seconds=2.0),
        mesh=tp_mesh,
    )
    got3 = teng.encode_batch([full[i, : valid[i]] for i in range(3)])
    np.savez(
        os.path.join(args.out, f"tp_engine_p{args.process_id}.npz"),
        **{str(i): c for i, c in enumerate(got3)},
    )

    # stream policy under multiprocess: the per-process streaming encoder
    # must materialize its local replica of the mesh-replicated params
    # (no collectives run on this path)
    spf = cfg.samples_per_frame
    seng = MimiEncoderEngine(
        params,
        cfg,
        EngineConfig(
            batch_size=max(4, n_dev),
            min_bucket_seconds=0.25,
            max_chunk_seconds=2 * spf / 24_000,
            long_audio_policy="stream",
        ),
        mesh=mesh,
    )
    long_audio = full[0]  # 4*spf samples, > the 2-frame cap -> streams
    np.save(
        os.path.join(args.out, f"stream_p{args.process_id}.npy"),
        seng.encode_batch([long_audio])[0],
        allow_pickle=False,
    )
    print(f"proc {args.process_id} ok", flush=True)


if __name__ == "__main__":
    main()
