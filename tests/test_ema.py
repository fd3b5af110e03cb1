"""EMAHook + MemoryProfilerHook parity (mmcv hooks enabled via custom_hooks).

Reference: EMAHook keeps shadow weights ema = (1-m)*ema + m*param after every
optimizer step and swaps them in for eval; MemoryProfilerHook logs host memory
every N iters (mmdet/core/hook/memory_profiler_hook.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sph_retina_tpu.engine.builder import build_tx
from sph_retina_tpu.engine.runner import memory_report
from sph_retina_tpu.engine.train import (
    TrainState,
    build_optimizer,
    get_ema_params,
    step_lr_schedule,
    with_ema_params,
)


def _sgd_state(params, tx):
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats={}, opt_state=tx.init(params))


def test_ema_tracks_post_update_params():
    m = 0.5  # large momentum so the expected values are easy to follow
    tx = build_optimizer(step_lr_schedule(0.1, 10, warmup_iters=0),
                         ema_momentum=m)
    params = {"w": jnp.ones((3,))}
    opt_state = tx.init(params)
    # EMA initialises to a copy of the params
    ema0 = get_ema_params(opt_state)
    np.testing.assert_allclose(np.asarray(ema0["w"]), 1.0)

    grads = {"w": jnp.full((3,), 2.0)}
    updates, opt_state = tx.update(grads, opt_state, params)
    new_params = optax.apply_updates(params, updates)
    ema1 = get_ema_params(opt_state)
    # mmcv convention: ema = ema + m * (param_new - ema)
    expected = 1.0 + m * (np.asarray(new_params["w"]) - 1.0)
    np.testing.assert_allclose(np.asarray(ema1["w"]), expected, rtol=1e-6)


def test_ema_absent_when_disabled():
    tx = build_optimizer(step_lr_schedule(0.1, 10))
    params = {"w": jnp.ones((2,))}
    state = _sgd_state(params, tx)
    assert get_ema_params(state.opt_state) is None
    # with_ema_params is a no-op without EMA state
    assert with_ema_params(state) is state


def test_with_ema_params_swaps_weights():
    tx = build_optimizer(step_lr_schedule(0.1, 10, warmup_iters=0),
                         ema_momentum=0.25)
    params = {"w": jnp.zeros((2,))}
    state = _sgd_state(params, tx)
    grads = {"w": jnp.ones((2,))}
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    state = state._replace(params=optax.apply_updates(state.params, updates),
                           opt_state=opt_state)
    swapped = with_ema_params(state)
    ema = get_ema_params(state.opt_state)
    np.testing.assert_allclose(np.asarray(swapped.params["w"]),
                               np.asarray(ema["w"]))
    # raw params untouched on the original state
    assert not np.allclose(np.asarray(state.params["w"]),
                           np.asarray(swapped.params["w"]))


def test_ema_composes_with_frozen_prefixes():
    tx = build_optimizer(step_lr_schedule(0.1, 10, warmup_iters=0),
                         frozen_prefixes=("backbone/conv1",),
                         ema_momentum=0.5)
    params = {"backbone": {"conv1": {"w": jnp.ones((2,))}},
              "head": {"w": jnp.ones((2,))}}
    opt_state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, opt_state = tx.update(grads, opt_state, params)
    new_params = optax.apply_updates(params, updates)
    # frozen subtree: no update, EMA stays at the frozen value
    np.testing.assert_allclose(
        np.asarray(new_params["backbone"]["conv1"]["w"]), 1.0)
    ema = get_ema_params(opt_state)
    np.testing.assert_allclose(np.asarray(ema["backbone"]["conv1"]["w"]), 1.0)
    # trained subtree: EMA moved toward the updated value
    assert not np.allclose(np.asarray(ema["head"]["w"]), 1.0)


def test_build_tx_reads_custom_hooks():
    cfg = {"optimizer": {"lr": 0.01},
           "custom_hooks": [{"type": "EMAHook", "momentum": 0.002}]}
    tx = build_tx(cfg, steps_per_epoch=10)
    params = {"w": jnp.ones((2,))}
    assert get_ema_params(tx.init(params)) is not None
    # without the hook, no EMA state
    tx2 = build_tx({"optimizer": {"lr": 0.01}}, steps_per_epoch=10)
    assert get_ema_params(tx2.init(params)) is None


def test_memory_report_has_host_stats():
    stats = memory_report()
    assert stats.get("host_total_mb", 0) > 0
    assert "process_rss_mb" in stats
