"""Multi-chip data-parallel tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from s2anet_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate_state,
    shard_batch,
)


def test_virtual_mesh_has_8_devices():
    assert jax.device_count() == 8


def test_mesh_and_shardings():
    mesh = make_mesh()
    assert mesh.devices.shape == (8,)
    batch = {"imgs": np.zeros((8, 16, 16, 3), np.float32)}
    sharded = shard_batch(mesh, batch)
    assert sharded["imgs"].sharding.spec == batch_sharding(mesh).spec


def test_data_parallel_psum_semantics():
    """A sharded-batch jit computes global-batch math: gradient of a summed
    loss over a sharded batch equals the single-device gradient."""
    mesh = make_mesh()
    w = jnp.ones((4, 4))
    x = np.arange(8 * 4, dtype=np.float32).reshape(8, 4)

    def loss(w, x):
        return ((x @ w) ** 2).sum()

    g_single = jax.grad(loss)(w, jnp.asarray(x))

    from jax.sharding import NamedSharding, PartitionSpec as P

    g_fn = jax.jit(
        jax.grad(loss),
        in_shardings=(NamedSharding(mesh, P()), NamedSharding(mesh, P("data"))),
        out_shardings=NamedSharding(mesh, P()),
    )
    g_multi = g_fn(w, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(g_multi), np.asarray(g_single),
                               rtol=1e-5)


@pytest.mark.slow
def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


@pytest.mark.slow
def test_graft_entry_smoke():
    """entry() must return a jittable fn + args (tiny variant here: we only
    check the callable traces, not the 1024^2 flagship compile)."""
    import __graft_entry__ as ge

    fn, args = ge.entry()
    jax.eval_shape(fn, *args)  # trace without compiling
