# SPDX-License-Identifier: Apache-2.0
"""Serving over a device mesh: dp-sharded batch + tp-sharded params produce
token-identical output vs the single-device engine (VERDICT r2 item 5; the
measured comm model lives in SCALING.md / scripts/scaling_model.py)."""

import numpy as np
import pytest

import jax

pytestmark = pytest.mark.slow  # mesh/serving heavyweight (deselect: -m 'not slow')

from jax.sharding import Mesh  # noqa: E402

from gemlite_tpu.models import LlamaConfig, init_llama, quantize_llama  # noqa: E402
from gemlite_tpu.models.llama import shard_llama  # noqa: E402
from gemlite_tpu.serving import ContinuousBatchingEngine  # noqa: E402


def _mk_model(seed=0, layers=2, heads=4, hidden=128):
    cfg = LlamaConfig.tiny(vocab_size=128, hidden_size=hidden,
                           intermediate_size=2 * hidden, num_layers=layers,
                           num_heads=heads, num_kv_heads=heads // 2,
                           head_dim=hidden // heads, max_seq_len=64)
    params = quantize_llama(init_llama(cfg, seed=seed), W_nbits=4, group_size=32)
    return params, cfg


def _gen(engine, prompts, n=10):
    return engine.generate(prompts, max_new_tokens=n)


def test_engine_dp_sharded_batch():
    """Slots sharded over a dp axis: same tokens as the single-device engine
    (dense bucketed cache; batch axis of kv + per-step arrays on dp)."""
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    params, cfg = _mk_model(seed=5)
    rng = np.random.default_rng(2)
    prompts = [list(rng.integers(0, 128, size=n)) for n in (7, 12, 4, 9)]

    plain = ContinuousBatchingEngine(params, cfg, max_batch=4, paged=False)
    want = _gen(plain, prompts)

    mesh = Mesh(np.array(jax.devices()[:2]), ("dp",))
    eng = ContinuousBatchingEngine(params, cfg, max_batch=4, paged=False,
                                   mesh=mesh, dp_axis="dp")
    got = _gen(eng, prompts)
    assert got == want


def test_engine_dp_tp_2d():
    """2D serving: dp-sharded slots x tp-sharded packed weights on a 2x2
    mesh — still token-identical to the single-device engine."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4+ devices")
    params, cfg = _mk_model(seed=6)
    rng = np.random.default_rng(3)
    prompts = [list(rng.integers(0, 128, size=n)) for n in (6, 10, 5, 8)]

    plain = ContinuousBatchingEngine(params, cfg, max_batch=4, paged=False)
    want = _gen(plain, prompts)

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("dp", "tp"))
    sharded = shard_llama(params, mesh, "tp")
    eng = ContinuousBatchingEngine(sharded, cfg, max_batch=4, paged=False,
                                   mesh=mesh, dp_axis="dp")
    got = _gen(eng, prompts)
    assert got == want


def test_engine_dp_rejects_paged():
    params, cfg = _mk_model(seed=7)
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    mesh = Mesh(np.array(jax.devices()[:2]), ("dp",))
    with pytest.raises(ValueError, match="paged=False"):
        ContinuousBatchingEngine(params, cfg, max_batch=4, paged=True,
                                 mesh=mesh, dp_axis="dp")
