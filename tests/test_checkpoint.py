"""Orbax sharded checkpoint save/restore round trip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cae_tools_tpu.train.checkpoint import (
    latest_step,
    restore_checkpoint,
    save_checkpoint,
)


def test_orbax_roundtrip(tmp_path):
    folder = str(tmp_path / "model")
    params = {
        "w": jnp.arange(12, dtype=jnp.float32).reshape(3, 4),
        "convs": [{"k": jnp.ones((2, 2))}],
    }
    state = {"bn": {"mean": jnp.zeros((4,)), "count": jnp.asarray(3, jnp.int32)}}
    save_checkpoint(folder, 10, params, state)
    save_checkpoint(folder, 20, jax.tree_util.tree_map(lambda a: a + 1, params), state)
    assert latest_step(folder) == 20

    restored = restore_checkpoint(folder)
    np.testing.assert_allclose(
        np.asarray(restored["params"]["w"]), np.asarray(params["w"]) + 1
    )
    restored10 = restore_checkpoint(folder, step=10)
    np.testing.assert_allclose(
        np.asarray(restored10["params"]["w"]), np.asarray(params["w"])
    )
    assert int(restored["state"]["bn"]["count"]) == 3


def test_orbax_sharded_roundtrip(tmp_path):
    from cae_tools_tpu.parallel.mesh import get_mesh
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = get_mesh(n_data=4, n_model=2)
    folder = str(tmp_path / "sharded")
    w = jax.device_put(
        np.arange(8 * 256, dtype=np.float32).reshape(8, 256),
        NamedSharding(mesh, P(None, "model")),
    )
    save_checkpoint(folder, 1, {"w": w}, {})
    template = {"params": {"w": w}, "state": {}}
    restored = restore_checkpoint(folder, template=template)
    np.testing.assert_allclose(np.asarray(restored["params"]["w"]), np.asarray(w))
    # restored array keeps the template's sharding
    assert restored["params"]["w"].sharding.spec == P(None, "model")
