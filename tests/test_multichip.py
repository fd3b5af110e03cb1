"""Multi-device data-parallel training on the virtual 8-device CPU mesh.

The reference has no multi-node tests at all (SURVEY.md §4B); this exercises
the sharded train step end-to-end: batch sharded over the mesh, replicated
params, XLA-inserted gradient all-reduce.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sph_retina_tpu.engine import (
    build_optimizer,
    create_train_state,
    make_train_step,
    shard_batch,
    step_lr_schedule,
)
from sph_retina_tpu.engine.train import replicate_state
from sph_retina_tpu.geometry import generate_boxes
from sph_retina_tpu.models import SphRetinaNet
from sph_retina_tpu.models.single_stage import retina_config, retina_loss

N_DEV = 8


@pytest.fixture(scope="module")
def mesh():
    devices = np.array(jax.devices()[:N_DEV])
    assert len(devices) == N_DEV, "conftest must provide 8 virtual devices"
    return Mesh(devices, axis_names=("data",))


def _batch(b, h, w, g, nc):
    rng = jax.random.PRNGKey(0)
    return {
        "images": jax.random.normal(rng, (b, h, w, 3)),
        "gt_boxes": jnp.stack([
            jnp.asarray(generate_boxes(g, 4, seed=i)) for i in range(b)]),
        "gt_labels": jnp.tile(jnp.arange(g) % nc, (b, 1)),
        "gt_mask": jnp.tile(jnp.arange(g) < g // 2, (b, 1)),
    }


def test_dp_train_step_on_mesh(mesh):
    h, w, nc = 64, 128, 5
    cfg = retina_config(nc, img_size=(h, w))
    # R18: DP semantics are depth-independent; R50 costs 10+ min of
    # single-threaded XLA-CPU compile on a 1-core host.
    model = SphRetinaNet(num_classes=nc, depth=18, dtype=jnp.float32)
    tx = build_optimizer(step_lr_schedule(0.01, 10), grad_clip=35.0)
    batch = _batch(N_DEV, h, w, 8, nc)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), tx,
                               batch["images"][:1])
    state = replicate_state(state, mesh)
    sharded = shard_batch(batch, mesh)
    # batch really is sharded over the data axis
    assert sharded["images"].sharding.spec == P("data", None, None, None)

    step = jax.jit(make_train_step(model, cfg, tx, retina_loss),
                   donate_argnums=0)
    with mesh:
        losses = []
        for _ in range(2):
            state, metrics = step(state, sharded)
            losses.append(float(metrics["loss"]))
    assert all(np.isfinite(l) for l in losses)
    # params stay replicated (all-reduced grads identical on every device)
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_dryrun_multichip_entry():
    """The driver's dryrun entry must run as-is (it pins the CPU platform
    itself; under the suite the backend is already cpu+8, which it accepts)."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)


def test_sharded_matches_single_device(mesh):
    """DP over 8 devices must produce the same loss as one device."""
    h, w, nc = 64, 128, 5
    cfg = retina_config(nc, img_size=(h, w))
    model = SphRetinaNet(num_classes=nc, depth=18, dtype=jnp.float32)
    tx = build_optimizer(step_lr_schedule(0.01, 10))
    batch = _batch(N_DEV, h, w, 8, nc)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), tx,
                               batch["images"][:1])
    step = jax.jit(make_train_step(model, cfg, tx, retina_loss))

    _, m_single = step(state, batch)

    state_r = replicate_state(state, mesh)
    with mesh:
        _, m_sharded = step(state_r, shard_batch(batch, mesh))
    np.testing.assert_allclose(float(m_single["loss"]),
                               float(m_sharded["loss"]), rtol=1e-4)
