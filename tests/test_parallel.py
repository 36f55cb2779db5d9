"""Mesh/sharding semantics: tp-sharded transformer == replicated, bit for bit."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from tests.mimi_fixtures import make_oracle, tiny_hf_config
from tokenize_audio_tpu.mimi.model import encode
from tokenize_audio_tpu.parallel.mesh import make_mesh, replicate_params, shard_params_tp


@pytest.fixture(scope="module")
def tiny_oracle():
    return make_oracle(tiny_hf_config())


def test_make_mesh_shapes():
    m = make_mesh(dp=4, tp=2)
    assert m.shape == {"data": 4, "model": 2}
    m1 = make_mesh()  # all devices, tp=1
    assert m1.shape["model"] == 1 and m1.shape["data"] == 8


def test_tp_sharded_encode_equals_replicated(tiny_oracle, rng):
    _, params, cfg = tiny_oracle
    mesh = make_mesh(dp=2, tp=4)
    audio = (rng.standard_normal((2, 2 * 1920)) * 0.3).astype(np.float32)
    valid = np.array([2 * 1920, 1500], dtype=np.int32)

    bsh = NamedSharding(mesh, P("data"))
    a = jax.device_put(jnp.asarray(audio), bsh)
    v = jax.device_put(jnp.asarray(valid), bsh)

    p_rep = replicate_params(params, mesh)
    c_rep, _ = encode(p_rep, cfg, a, v)

    p_tp = shard_params_tp(params, mesh)
    # q/k/v sharded over heads on 'model'; o/fc2 row-parallel
    assert p_tp["tfm"][0]["q"].sharding.spec == P("model", None)
    assert p_tp["tfm"][0]["fc2"].sharding.spec == P(None, "model")
    c_tp, _ = encode(p_tp, cfg, a, v)

    np.testing.assert_array_equal(np.asarray(c_rep), np.asarray(c_tp))


def test_multihost_helpers_single_process():
    """multihost helpers degrade to plain sharded device_put/asarray under
    one process, so engine code is process-count agnostic."""
    import jax
    import numpy as np

    from tokenize_audio_tpu.parallel import multihost
    from tokenize_audio_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(jax.devices()[:8], dp=8, tp=1)
    batch = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
    g = multihost.host_local_to_global(batch, mesh)
    assert g.shape == (16, 3)
    assert str(g.sharding.spec) == "PartitionSpec('data',)"
    back = multihost.local_rows(g)
    assert (back == batch).all()
    assert multihost.process_span(16) == (0, 16)
