"""Functional memory-state machines: temporal history bank + config
round trips. (The NodeMemoryBank state machine is parity-tested against
the reference in tests/parity/test_layer_parity.py.)"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tagan_tpu as tt
from tagan_tpu.core.memory import (init_temporal_memory,
                                   temporal_memory_append,
                                   temporal_memory_interpolate,
                                   init_memory, memory_update,
                                   memory_decay_all, memory_reset,
                                   memory_stats)


def test_temporal_memory_append_and_exact_read():
    tm = init_temporal_memory(4, 3, 2)
    s1 = jnp.asarray([[1., 1.], [2., 2.], [0., 0.], [0., 0.]])
    tm = temporal_memory_append(tm, jnp.asarray([True, True, False, False]),
                                s1, 0.0)
    s2 = s1 * 3
    tm = temporal_memory_append(tm, jnp.asarray([True, False, False, False]),
                                s2, 2.0)
    out, has = temporal_memory_interpolate(tm, 0.0)
    np.testing.assert_allclose(np.asarray(out)[0], [1., 1.])
    np.testing.assert_allclose(np.asarray(out)[1], [2., 2.])
    assert not bool(has[2])


def test_temporal_memory_linear_interpolation():
    tm = init_temporal_memory(2, 4, 1)
    tm = temporal_memory_append(tm, jnp.asarray([True, False]),
                                jnp.asarray([[0.0], [0.0]]), 0.0)
    tm = temporal_memory_append(tm, jnp.asarray([True, False]),
                                jnp.asarray([[10.0], [0.0]]), 10.0)
    out, _ = temporal_memory_interpolate(tm, 4.0)
    np.testing.assert_allclose(float(out[0, 0]), 4.0, rtol=1e-5)


def test_temporal_memory_decayed_backfill():
    """Query past the last entry: decayed last state
    (memory_bank.py:444-453 semantics)."""
    tm = init_temporal_memory(1, 4, 1)
    tm = temporal_memory_append(tm, jnp.asarray([True]),
                                jnp.asarray([[8.0]]), 0.0)
    out, _ = temporal_memory_interpolate(tm, 2.0, decay_factor=0.5)
    np.testing.assert_allclose(float(out[0, 0]), 8.0 * 0.25, rtol=1e-5)


def test_temporal_memory_ring_truncation():
    tm = init_temporal_memory(1, 2, 1)    # history of 2
    for t in range(4):
        tm = temporal_memory_append(tm, jnp.asarray([True]),
                                    jnp.asarray([[float(t)]]), float(t))
    assert int(tm.count[0]) == 2
    out, _ = temporal_memory_interpolate(tm, 3.0)
    np.testing.assert_allclose(float(out[0, 0]), 3.0)


def test_memory_utils():
    mem = init_memory(4, 2)
    mem = memory_update(mem, jnp.asarray([True, True, False, False]),
                        jnp.ones((4, 2)), 0)
    assert int(mem.size) == 2
    stats = memory_stats(mem)
    assert int(stats["num_nodes"]) == 2
    decayed = memory_decay_all(mem, 0.5)
    np.testing.assert_allclose(np.asarray(decayed.states)[0], [0.5, 0.5])
    assert int(memory_reset(mem).size) == 0


def test_config_json_roundtrip(tmp_path):
    cfg = tt.TAGANConfig(hidden_dim=32, num_heads=4, loss_type="focal",
                         spatial_backend="flash", remat=True)
    path = os.path.join(tmp_path, "cfg.json")
    cfg.to_json(path)
    back = tt.TAGANConfig.from_json(path)
    assert back == cfg

    exp = tt.ExperimentConfig(model=cfg, batch_size=4,
                              lr_scheduler="plateau")
    path2 = os.path.join(tmp_path, "exp.json")
    exp.to_json(path2)
    back2 = tt.ExperimentConfig.from_json(path2)
    assert back2 == exp
    assert back2.model == cfg
