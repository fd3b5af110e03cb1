"""Multi-axis sharding: DP x spatial partitioning and FSDP-style states.

Goes beyond the reference's DP-only stack (SURVEY.md §2.4): image width
sharded over a 'space' mesh axis (GSPMD halo-exchanged convolutions) and
ZeRO-3 parameter/optimizer sharding over 'data'. Both must reproduce the
single-device loss exactly (same math, different placement).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sph_retina_tpu.engine import (
    build_optimizer,
    create_train_state,
    make_train_step,
    step_lr_schedule,
)
from sph_retina_tpu.geometry import generate_boxes
from sph_retina_tpu.models import SphRetinaNet
from sph_retina_tpu.models.single_stage import retina_config, retina_loss
from sph_retina_tpu.parallel import (
    batch_specs,
    fsdp_spec,
    make_mesh,
    shard_batch_spatial,
    shard_state_fsdp,
)

N_DEV = 8


def _batch(b, h, w, g, nc):
    rng = jax.random.PRNGKey(0)
    return {
        "images": jax.random.normal(rng, (b, h, w, 3)),
        "gt_boxes": jnp.stack([
            jnp.asarray(generate_boxes(g, 4, seed=i)) for i in range(b)]),
        "gt_labels": jnp.tile(jnp.arange(g) % nc, (b, 1)),
        "gt_mask": jnp.tile(jnp.arange(g) < g // 2, (b, 1)),
    }


@pytest.fixture(scope="module")
def setup():
    h, w, nc = 64, 128, 5
    cfg = retina_config(nc, img_size=(h, w))
    model = SphRetinaNet(num_classes=nc, depth=18, dtype=jnp.float32)
    tx = build_optimizer(step_lr_schedule(0.01, 10))
    batch = _batch(N_DEV, h, w, 8, nc)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), tx,
                               batch["images"][:1])
    step = jax.jit(make_train_step(model, cfg, tx, retina_loss))
    _, m_ref = step(state, batch)
    return state, step, batch, float(m_ref["loss"])


def test_fsdp_spec_picks_divisible_dim():
    assert fsdp_spec((3, 3, 64, 128), 8) == jax.sharding.PartitionSpec(
        None, None, None, "data")
    # falls back to earlier dims when the trailing ones don't divide
    assert fsdp_spec((256, 7), 8) == jax.sharding.PartitionSpec("data", None)
    # nothing divisible -> replicate
    assert fsdp_spec((7,), 8) == jax.sharding.PartitionSpec()
    assert fsdp_spec((), 8) == jax.sharding.PartitionSpec()
    # single-device axis -> replicate
    assert fsdp_spec((64,), 1) == jax.sharding.PartitionSpec()


def test_spatial_partitioned_step_matches(setup):
    """(4 data x 2 space) mesh: width-sharded convs reproduce the loss."""
    state, step, batch, ref_loss = setup
    mesh = make_mesh(N_DEV, space=2)
    assert dict(mesh.shape) == {"data": 4, "space": 2}
    sharded = shard_batch_spatial(batch, mesh)
    spec = sharded["images"].sharding.spec
    assert spec == jax.sharding.PartitionSpec("data", None, "space", None)

    from sph_retina_tpu.engine.train import replicate_state
    with mesh:
        _, metrics = step(replicate_state(state, mesh), sharded)
    np.testing.assert_allclose(float(metrics["loss"]), ref_loss, rtol=1e-4)


def test_fsdp_sharded_step_matches(setup):
    """ZeRO-3 placement: params/opt-state sharded over 'data', same loss,
    and the updated state keeps its sharded placement."""
    state, step, batch, ref_loss = setup
    mesh = make_mesh(N_DEV, space=1)
    fstate = shard_state_fsdp(state, mesh)
    # at least one large leaf actually sharded
    shardings = [l.sharding for l in jax.tree_util.tree_leaves(fstate.params)]
    assert any(not s.is_fully_replicated for s in shardings)

    sharded = shard_batch_spatial(batch, mesh)
    with mesh:
        new_state, metrics = step(fstate, sharded)
    np.testing.assert_allclose(float(metrics["loss"]), ref_loss, rtol=1e-4)
    new_shardings = [l.sharding
                     for l in jax.tree_util.tree_leaves(new_state.params)]
    assert any(not s.is_fully_replicated for s in new_shardings)


def test_fsdp_spatial_combined_matches(setup):
    """FSDP params + spatially-sharded input together (the regression case:
    input-channel-sharded conv kernels under a 'space'-sharded input
    miscompile; fsdp_spec must keep conv kernels on out-channels)."""
    state, step, batch, ref_loss = setup
    mesh = make_mesh(N_DEV, space=2)
    with mesh:
        _, metrics = step(shard_state_fsdp(state, mesh),
                          shard_batch_spatial(batch, mesh))
    # collective reduction order differs with both axes active: 1e-3 budget
    np.testing.assert_allclose(float(metrics["loss"]), ref_loss, rtol=1e-3)


def test_make_mesh_rejects_indivisible():
    with pytest.raises(ValueError):
        make_mesh(N_DEV, space=3)


def test_sharded_pairwise_overlaps_matches_single_device():
    """Row-sharded (N, M) IoU slab == unsharded result (the long-context
    analogue: assignment-scale pair matrices spread over the mesh)."""
    import jax.numpy as jnp
    import numpy as np

    from sph_retina_tpu.geometry import generate_boxes
    from sph_retina_tpu.iou.api import sph_overlaps
    from sph_retina_tpu.parallel import make_mesh, sharded_pairwise_overlaps

    # 61 rows: NOT divisible by 8, exercises the pad/strip path
    b1 = jnp.asarray(generate_boxes(61, 4, seed=1))
    b2 = jnp.asarray(generate_boxes(7, 4, seed=2))
    mesh = make_mesh(8)
    got = sharded_pairwise_overlaps(b1, b2, mesh)
    assert got.shape == (61, 7)
    want = sph_overlaps(b1, b2, "sph2pob_efficient", is_aligned=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)
