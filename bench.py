"""North-star benchmarks on one chip, emitted as ONE JSON line.

Primary metric (north-star #1): fused spherical box-pair IoU throughput.
Reproduces the reference's headline workload — IoU of 1,000,000 random
spherical box pairs, uniform theta in (0,360), phi in (0,180), fov in (1,100)
deg (/root/reference/tests/test_all_ious.py:141-147, README.md:43) — through
the fused Pallas sph2pob+rotated-IoU kernel, timed device-side (fori_loop
with input perturbation so iterations cannot be CSE'd).
Baseline: reference CUDA pipeline (sph2pob transform + mmcv box_iou_rotated)
does 1M pairs in 0.0096 s = 104.2 M pairs/s (/root/reference/README.md:38).

Secondary metrics (north-star #2), under "extra": end-to-end RetinaNet-R50
BFoV train and inference img/s (B=8, 512x1024, bf16), methodology after the
reference FPS tool (/root/reference/tools/analysis_tools/benchmark.py:102-133
— warmup then wall-clock over synced iterations). Baselines are the A100
estimates derived in BASELINE.md (train 26 img/s, inference 70 img/s).
"""

import json
import math
import os
import subprocess
import sys
import time

N = int(os.environ.get("BENCH_N", 1_000_000))  # smoke-test override
ITERS = int(os.environ.get("BENCH_ITERS", 100))
BASELINE_MPAIRS_S = 104.2  # reference CUDA, 1M pairs / 0.0096 s
A100_TRAIN_IMGS_S = 26.0   # estimated, BASELINE.md "A100 estimate" section
A100_INFER_IMGS_S = 70.0   # estimated, BASELINE.md "A100 estimate" section
# Reference deg2kent host loop (kent_formator.py:833-839), measured directly
# on this machine's CPU via the reference's own module (BASELINE.md "Kent").
REF_DEG2KENT_BOXES_S = 293.0
V5E_PEAK_BF16_FLOPS = 197e12  # one v5e chip, bf16 (public spec)


def _import_jax():
    """Deferred so the supervisor process never touches the TPU tunnel."""
    global jax, jnp, generate_boxes, sph2pob_iou_aligned_tpu
    import jax
    if os.environ.get("BENCH_PLATFORM"):
        # the axon site hook pins jax_platforms at interpreter start, so a
        # JAX_PLATFORMS env var cannot redirect a smoke run; this can.
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    import jax.numpy as jnp
    from sph_retina_tpu.geometry import generate_boxes
    from sph_retina_tpu.ops import sph2pob_iou_aligned_tpu


def _marginal_seconds(timed, short, long_, trials=3):
    """Jitter-robust marginal seconds-per-iteration between a short and a
    long run: ``(timed(long_) - timed(short)) / (long_ - short)``.

    Round 4 recorded a *negative* headline (BENCH_r04: -2.9 G pairs/s)
    because one tunnel-jitter inversion (t_long < t_short) made the
    marginal negative and ``min`` over trials then preferred it. Fix
    (VERDICT r4 item 2): discard non-positive estimates, retry up to 3x
    the trial budget, and report the MEDIAN of the surviving positive
    estimates — robust to a single inflated or deflated sample in either
    direction. Raises if no positive estimate can be obtained, so a
    corrupted number can never be emitted.
    """
    ests = []
    attempts = 0
    while len(ests) < trials and attempts < trials * 3:
        attempts += 1
        t_s = timed(short)
        t_l = timed(long_)
        est = (t_l - t_s) / (long_ - short)
        if est > 0:
            ests.append(est)
    if not ests:
        raise RuntimeError(
            "marginal-rate timing got no positive estimate in "
            f"{attempts} attempts (tunnel jitter?)")
    ests.sort()
    return ests[len(ests) // 2]


def bench_iou():
    b1 = jnp.asarray(generate_boxes(N, 4, seed=1))
    b2 = jnp.asarray(generate_boxes(N, 4, seed=2))

    @jax.jit
    def loop(x, y, iters):
        def body(i, acc):
            xx = x + i.astype(jnp.float32) * 1e-6
            return acc + jnp.sum(sph2pob_iou_aligned_tpu(xx, y))
        return jax.lax.fori_loop(0, iters, body, 0.0)

    float(loop(b1, b2, 2))  # compile + warm (fetch actually blocks)

    def timed(iters):
        t0 = time.perf_counter()
        float(loop(b1, b2, iters))
        return time.perf_counter() - t0

    # Marginal rate between a short and a long device-side loop: cancels
    # the fixed dispatch + tunnel-fetch overhead (~30 ms/call here), which
    # at these kernel speeds (~0.4 ms per 1M pairs) otherwise dominates
    # and understates throughput ~9x. Same methodology as the train/infer
    # benches and tools/benchmark_iou.py.
    return N / _marginal_seconds(timed, ITERS // 10, ITERS, trials=3)


def bench_pairwise(n=131072, m=128):
    """Assignment-shaped pairwise kernel: (n, 4) x (m, 4) -> (n, m)."""
    from sph_retina_tpu.ops import sph2pob_iou_pairwise_tpu

    b1 = jnp.asarray(generate_boxes(n, 4, seed=3))
    b2 = jnp.asarray(generate_boxes(m, 4, seed=4))

    @jax.jit
    def loop(x, y, iters):
        def body(i, acc):
            xx = x + i.astype(jnp.float32) * 1e-6
            return acc + jnp.sum(sph2pob_iou_pairwise_tpu(xx, y))
        return jax.lax.fori_loop(0, iters, body, 0.0)

    float(loop(b1, b2, 2))

    def timed(iters):
        t0 = time.perf_counter()
        float(loop(b1, b2, iters))
        return time.perf_counter() - t0

    return n * m / _marginal_seconds(timed, 5, 50, trials=3)


def bench_unbiased(n=1_000_000):
    """Exact unbiased spherical IoU oracle, n aligned pairs -> seconds."""
    from sph_retina_tpu.iou import sph_overlaps

    b1 = jnp.asarray(generate_boxes(n, 4, seed=5))
    b2 = jnp.asarray(generate_boxes(n, 4, seed=6))

    @jax.jit
    def loop(x, y, iters):
        def body(i, acc):
            xx = x + i.astype(jnp.float32) * 1e-6
            return acc + jnp.sum(sph_overlaps(xx, y, "unbiased",
                                              is_aligned=True))
        return jax.lax.fori_loop(0, iters, body, 0.0)

    float(loop(b1, b2, 1))

    def timed(iters):
        t0 = time.perf_counter()
        float(loop(b1, b2, iters))
        return time.perf_counter() - t0

    return _marginal_seconds(timed, 2, 10, trials=3)


def bench_consistency(n=N, k_pairwise=1024):
    """Correctness statistics vs the on-device unbiased oracle (VERDICT r2
    item 2): Pearson R (all / low-latitude / high-latitude pairs) and
    mean/max abs error for the sph2pob_efficient aligned path and both
    Pallas kernels, on the reference's random-box distribution. Latitude
    split: a pair is "low" when both centers are within 45 deg of the
    equator (|phi - 90| < 45), "high" otherwise — the paper's R_low/R_high
    axis (pole distortion is what the approximations get wrong)."""
    from sph_retina_tpu.iou import sph_overlaps
    from sph_retina_tpu.ops import (
        sph2pob_iou_aligned_tpu,
        sph2pob_iou_pairwise_tpu,
    )

    b1 = jnp.asarray(generate_boxes(n, 4, seed=21))
    b2 = jnp.asarray(generate_boxes(n, 4, seed=22))

    @jax.jit
    def stats(x, g, mask):
        # Pearson R in float64-equivalent accumulation is overkill here;
        # what matters is publishing enough digits that the strata are
        # distinguishable (VERDICT r4 item 8: R_low==R_high at 4 decimals
        # carried no information). R to 6 decimals + per-stratum
        # mean/p99/max error makes a pole-regression detectable.
        m = mask.astype(jnp.float32)
        cnt = jnp.sum(m)
        mx = jnp.sum(x * m) / cnt
        mg = jnp.sum(g * m) / cnt
        dx = (x - mx) * m
        dg = (g - mg) * m
        r = jnp.sum(dx * dg) * jax.lax.rsqrt(
            jnp.maximum(jnp.sum(dx * dx) * jnp.sum(dg * dg), 1e-30))
        err = jnp.abs(x - g) * m
        # masked p99: invalid entries to -inf, sort desc, index at 1% of cnt
        desc = jnp.sort(jnp.where(mask, jnp.abs(x - g), -jnp.inf))[::-1]
        k = jnp.clip((0.01 * cnt).astype(jnp.int32), 0, desc.shape[0] - 1)
        return r, jnp.sum(err) / cnt, desc[k], jnp.max(err)

    gold = jax.jit(
        lambda a, b: sph_overlaps(a, b, "unbiased", is_aligned=True))(b1, b2)
    low = (jnp.abs(b1[:, 1] - 90.0) < 45.0) & (jnp.abs(b2[:, 1] - 90.0) < 45.0)

    out = {}

    def record(prefix, vals, gold_vals, low_mask):
        def put(suffix, mask):
            r, me, p99, xe = stats(vals, gold_vals, mask)
            out[f"{prefix}_pearson_r{suffix}"] = round(float(r), 6)
            out[f"{prefix}_mean_err{suffix}"] = round(float(me), 6)
            out[f"{prefix}_p99_err{suffix}"] = round(float(p99), 5)
            out[f"{prefix}_max_err{suffix}"] = round(float(xe), 4)

        put("", jnp.ones(vals.shape, bool))
        if low_mask is not None:
            put("_low", low_mask)
            put("_high", ~low_mask)

    eff = jax.jit(lambda a, b: sph_overlaps(
        a, b, "sph2pob_efficient", is_aligned=True))(b1, b2)
    record("sph2pob", eff, gold, low)
    record("pallas_aligned", sph2pob_iou_aligned_tpu(b1, b2), gold, low)

    # Pairwise Pallas kernel vs the pairwise oracle (assignment semantics).
    p1, p2 = b1[:k_pairwise], b2[:k_pairwise]
    pv = sph2pob_iou_pairwise_tpu(p1, p2).ravel()
    pg = jax.jit(lambda a, b: sph_overlaps(a, b, "unbiased"))(p1, p2).ravel()
    record("pallas_pairwise", pv, pg, None)
    return out


def bench_kent(batch=8, h=512, w=1024, n=131072):
    """Kent path end to end (VERDICT r2 item 8): vectorized on-device
    deg2kent throughput (reference: per-box host python loop,
    kent_formator.py:833-839, measured at ~293 boxes/s on this host) and a
    device-steady Kent-RetinaNet train rate (Kent-KLD assignment + KentLoss,
    configs/sph_kent_retinanet_r50_fpn_120e_indoor360.py)."""
    from sph_retina_tpu.iou.kent import deg2kent

    b = jnp.asarray(generate_boxes(n, 4, seed=31))

    @jax.jit
    def loop(x, iters):
        def body(i, acc):
            return acc + jnp.sum(deg2kent(x + i.astype(jnp.float32) * 1e-6))
        return jax.lax.fori_loop(0, iters, body, 0.0)

    float(loop(b, 1))

    def timed_kent(iters):
        t0 = time.perf_counter()
        float(loop(b, iters))
        return time.perf_counter() - t0

    per_iter = _marginal_seconds(timed_kent, 5, 50, trials=3)
    out = {
        "deg2kent_boxes_per_sec": round(n / per_iter),
        "deg2kent_vs_reference_host_loop": round(
            n / per_iter / REF_DEG2KENT_BOXES_S),
    }

    # Device-steady Kent-RetinaNet train rate (small step count: the Kent
    # assignment path compiles its own programs).
    from sph_retina_tpu.engine import create_train_state, make_train_step
    from sph_retina_tpu.engine.builder import build_tx
    from sph_retina_tpu.engine.zoo import get_family
    from sph_retina_tpu.models.single_stage import retina_loss
    from sph_retina_tpu.utils.config import load_config

    # fork-parity preset: Kent-KLD IoU drives ASSIGNMENT (no-grad), the
    # regression loss is delta-L1 on 5-dof KentCoder deltas — exactly the
    # fork's kent training path (base_kent_retinanet_r50_fpn.py:45; its
    # KentLoss exists only as a loss-registry entry there too). The
    # gradient-through-KLD variant is configs/sph_kent_retinanet_kld_*.py
    # (trains finite post-63fd329 pole/eigen guards; 3-seed numbers in
    # work_dirs/ap_study/AP_STUDY.md).
    file_cfg = load_config("configs/sph_kent_retinanet_r50_fpn_120e_indoor360.py")
    nc = file_cfg["model"]["num_classes"]
    bv = file_cfg["model"].get("box_version", 4)
    model, cfg = get_family(file_cfg).build(file_cfg)
    tx = build_tx(file_cfg, 100)
    rng = jax.random.PRNGKey(0)
    images = jax.random.normal(rng, (batch, h, w, 3), jnp.float32)
    max_gt = 16
    boxes = jnp.stack([jnp.asarray(generate_boxes(max_gt, bv, seed=i))
                       for i in range(batch)])
    train_batch = {
        "images": images,
        "gt_boxes": boxes,
        "gt_labels": jnp.tile(jnp.arange(max_gt) % nc, (batch, 1)),
        "gt_mask": jnp.tile(jnp.arange(max_gt) < max_gt // 2, (batch, 1)),
    }
    state = create_train_state(model, cfg, rng, tx, images[:1])
    step = make_train_step(model, cfg, tx, retina_loss)

    @jax.jit
    def many(st, niter):
        def body(i, carry):
            s0, acc = carry
            s2, met = step(s0, train_batch)
            return s2, acc + met["loss"]
        return jax.lax.fori_loop(0, niter, body, (st, 0.0))[1]

    # loss stays finite across real update steps, so the timing below can
    # never be measuring NaN arithmetic. This fork-parity config exercises
    # the no-grad Kent-KLD *assignment* path (deg2kent + KLD pole guards,
    # iou/kent.py); the gradient-through-KLD loss guards are covered by
    # test_kent_loss_degenerate_boxes_finite_grads.
    probe = float(many(state, 3))
    out["kent_train_loss_finite"] = bool(math.isfinite(probe))

    def timed_train(iters):
        t0 = time.perf_counter()
        float(many(state, iters))
        return time.perf_counter() - t0

    per_step = _marginal_seconds(timed_train, 2, 10, trials=3)
    out["kent_train_device_steady_imgs_per_sec"] = round(batch / per_step, 1)
    return out


def bench_e2e_pipeline(step, state, batch=8, h=512, w=1024, max_gt=16,
                       n_images=256):
    """Disk-to-device training throughput through the real input pipeline
    (VERDICT r2 item 4/5): JPEGs on disk -> native C++ (or PIL) decode ->
    resize -> flip -> normalize -> pad -> prefetch -> jitted train step.
    ``step``/``state`` come from bench_retinanet so the measured device work
    is identical to the device-steady number it is compared against."""
    import numpy as np

    from sph_retina_tpu.data import DataLoader, SphPipeline

    cache = os.path.join(
        os.environ.get("TMPDIR", "/tmp"),
        f"sph_retina_bench_jpegs_{h}x{w}_{n_images}")
    marker = os.path.join(cache, ".complete")
    if not os.path.exists(marker):
        from PIL import Image

        os.makedirs(cache, exist_ok=True)
        # Structured content (gradients + blocks), not noise: noise JPEGs
        # are pathological to encode/decode and 3x the realistic file size.
        yy, xx = np.mgrid[0:h, 0:w]
        for i in range(n_images):
            r = np.random.default_rng(i)
            img = np.stack([
                (xx * (0.1 + 0.1 * (i % 5)) + r.integers(0, 60)) % 256,
                (yy * 0.3 + r.integers(0, 60)) % 256,
                ((xx + yy) * 0.2) % 256,
            ], -1).astype(np.uint8)
            Image.fromarray(img).save(
                os.path.join(cache, f"{i}.jpg"), quality=85)
        with open(marker, "w") as f:
            f.write("ok")

    class _DiskDataset:
        def __len__(self):
            return n_images

        def __getitem__(self, idx):
            r = np.random.default_rng((99, idx))
            nb = max_gt // 2
            return {
                "img_id": idx,
                "img_path": os.path.join(cache, f"{idx}.jpg"),
                "boxes": generate_boxes(nb, 4, seed=idx),
                "labels": r.integers(0, 37, nb).astype(np.int32),
            }

    from sph_retina_tpu.data.loader import prefetch_to_device

    def transfer(b):
        return {
            "images": jnp.asarray(b["images"]),
            "gt_boxes": jnp.asarray(b["gt_boxes"]),
            "gt_labels": jnp.asarray(b["gt_labels"]),
            "gt_mask": jnp.asarray(b["gt_mask"]),
        }

    def measure(colorspace):
        # uint8 host pipeline + on-device normalize: 4x fewer bytes per
        # batch into the device than fp32; yuv420 halves that again (packed
        # I420, chroma upsample + YCbCr->RGB fused into the jitted step).
        # Decisive over the axon tunnel (~150 MB/s); still the right
        # default over PCIe.
        pipe = SphPipeline(img_size=(h, w), max_gt=max_gt, training=True,
                           normalize_on_device=True,
                           transfer_colorspace=colorspace)
        loader = DataLoader(_DiskDataset(), pipe, batch_size=batch,
                            num_workers=8, prefetch=4, seed=0)

        def run_epoch(epoch, st, device=True):
            n_done = 0
            if device:
                for db in prefetch_to_device(loader.epoch(epoch), transfer):
                    st, met = step(st, db)
                    n_done += batch
                # one scalar fetch drains the device queue (axon:
                # block_until_ready does not block; fetching a value does)
                float(jnp.asarray(met["loss"], jnp.float32))
            else:
                for _ in loader.epoch(epoch):
                    n_done += batch
            return st, n_done

        st, _ = run_epoch(0, state)          # warm: decode cache, compile
        t0 = time.perf_counter()
        st, n1 = run_epoch(1, st)
        st, n2 = run_epoch(2, st)
        rate = (n1 + n2) / (time.perf_counter() - t0)
        # Host-side ceiling: disk -> decode -> resize -> collate with no
        # device work; separates "can the host feed the device" from
        # host->device bandwidth.
        t0 = time.perf_counter()
        _, nh = run_epoch(3, st, device=False)
        return rate, nh / (time.perf_counter() - t0)

    e2e_yuv, host_yuv = measure("yuv420")
    e2e_rgb, host_rgb = measure("rgb")

    # Raw host->device bandwidth at the e2e batch size, so the e2e numbers
    # are interpretable against the link the run actually had (the axon
    # tunnel fluctuates ~30-160 MB/s and its serialization costs host CPU;
    # over PCIe this is >10 GB/s and e2e becomes host/device-bound).
    buf = np.zeros((batch, h, w, 3), np.uint8)
    jnp.asarray(buf).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(3):
        float(jnp.asarray(buf).ravel()[0])
    h2d = 3 * buf.nbytes / 1e6 / (time.perf_counter() - t0)
    return e2e_yuv, host_yuv, e2e_rgb, host_rgb, h2d


def bench_retinanet(batch=8, h=512, w=1024, max_gt=16, n_timed=10):
    """Train + inference img/s for RetinaNet-R50-FPN BFoV, bf16.

    Built through the public config path (same model/optimizer the CLI
    trains, including the reference's frozen_stages=1 stem+layer1 freeze —
    XLA prunes the frozen backward, so this is the rate real training
    sustains).
    """
    from sph_retina_tpu.engine import create_train_state, make_train_step
    from sph_retina_tpu.engine.builder import build_tx
    from sph_retina_tpu.engine.evaluator import make_predict_step
    from sph_retina_tpu.engine.zoo import get_family
    from sph_retina_tpu.models.single_stage import retina_loss
    from sph_retina_tpu.utils.config import load_config

    # The base preset (L1 loss, efficient assignment) — the same workload
    # class as the A100 estimate's mmdet-zoo RetinaNet figures and as every
    # earlier recorded round. The indoor360 *leaf* now mirrors its reference
    # namesake's heavier decoded-IoU-loss combo; benchmarking that instead
    # would silently change the measured workload between rounds.
    file_cfg = load_config("configs/_base_/sph_retinanet_r50_fpn.py")
    nc = file_cfg["model"]["num_classes"]  # 37, 360-Indoor
    model, cfg = get_family(file_cfg).build(file_cfg)
    tx = build_tx(file_cfg, 100)

    rng = jax.random.PRNGKey(0)
    images = jax.random.normal(rng, (batch, h, w, 3), jnp.float32)
    boxes = jnp.stack([jnp.asarray(generate_boxes(max_gt, 4, seed=i))
                       for i in range(batch)])
    train_batch = {
        "images": images,
        "gt_boxes": boxes,
        "gt_labels": jnp.tile(jnp.arange(max_gt) % nc, (batch, 1)),
        "gt_mask": jnp.tile(jnp.arange(max_gt) < max_gt // 2, (batch, 1)),
    }
    state = create_train_state(model, cfg, rng, tx, images[:1])
    step = jax.jit(make_train_step(model, cfg, tx, retina_loss))

    def fetch(out):
        # block_until_ready does not actually block over the axon tunnel;
        # fetching a computed scalar does (verify-skill gotcha).
        leaf = jax.tree_util.tree_leaves(out)[0]
        return float(jnp.asarray(leaf, jnp.float32).ravel()[0])

    def timed(fn, n, *args, state_arg=None):
        t0 = time.perf_counter()
        s = state_arg
        out = None
        for _ in range(n):
            if s is not None:
                s, out = fn(s, *args)
            else:
                out = fn(*args)
        fetch(out)
        return time.perf_counter() - t0

    def time_loop(fn, *args, state_arg=None):
        """Marginal rate between a short and a long run (cancels dispatch
        + fetch overhead; methodology per tools/benchmark_fps.py)."""
        n_short = max(2, n_timed // 4)
        per_step = _marginal_seconds(
            lambda n: timed(fn, n, *args, state_arg=state_arg),
            n_short, n_timed, trials=3)
        return batch / per_step

    # warmup/compile
    s, m = step(state, train_batch)
    jax.block_until_ready(m)
    train_ips = time_loop(step, train_batch, state_arg=s)

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    predict = make_predict_step(model, cfg)
    jax.block_until_ready(predict(variables, images).boxes)
    infer_ips = time_loop(predict, variables, images)

    # Device-resident steady state: the whole multi-step loop runs on
    # device (lax.fori_loop threading the train state / perturbing the
    # input, accumulating the loss / score sum so no iteration can be
    # elided), which removes per-step host dispatch entirely — the rate a
    # prefetched input pipeline sustains. Reported separately from the
    # host-loop numbers above, which mirror the reference FPS tool's
    # dispatch-inclusive methodology.
    @jax.jit
    def many_train(st, n):
        def body(i, carry):
            s0, acc = carry
            s2, met = step(s0, train_batch)
            return s2, acc + met["loss"]
        return jax.lax.fori_loop(0, n, body, (st, 0.0))[1]

    @jax.jit
    def many_infer(x, n):
        def body(i, acc):
            out = predict(variables, x + i.astype(jnp.float32) * 1e-6)
            return acc + jnp.sum(out.scores.astype(jnp.float32))
        return jax.lax.fori_loop(0, n, body, 0.0)

    def device_rate(fn, arg):
        float(fn(arg, 1))

        def timed_dev(n):
            t0 = time.perf_counter()
            float(fn(arg, n))
            return time.perf_counter() - t0

        return batch / _marginal_seconds(timed_dev, 2, 12, trials=3)

    train_dev = device_rate(many_train, state)
    infer_dev = device_rate(many_infer, images)

    # MFU (VERDICT r2 item 4): post-fusion HLO FLOPs of the full train step
    # (fwd + bwd + SGD update) from XLA's own cost analysis, against the
    # device-steady step time and the chip's bf16 peak.
    mfu = None
    try:
        cost = step.lower(state, train_batch).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        step_flops = float(cost.get("flops", 0.0))
        if step_flops > 0:
            mfu = step_flops * (train_dev / batch) / V5E_PEAK_BF16_FLOPS
    except Exception:
        pass
    return train_ips, infer_ips, train_dev, infer_dev, mfu, (step, state)


def _checkpoint_partial(result):
    """Persist the best-so-far result so a supervisor can salvage it if this
    child is killed mid-extras (tunnel hang / attempt timeout)."""
    path = os.environ.get("BENCH_PARTIAL_FILE")
    if not path:
        return
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write(json.dumps(result))
    os.replace(tmp, path)  # atomic: never a half-written JSON


def run_benchmarks():
    _import_jax()
    pairs_s = bench_iou()
    # A corrupted north-star must never be recorded again (VERDICT r4 #2):
    # the marginal estimator now discards inversions, and this guard makes
    # any residual pathology a hard failure instead of a bogus JSON line.
    assert math.isfinite(pairs_s) and pairs_s > 0, (
        f"bench_iou produced non-positive rate {pairs_s}")
    result = {
        "metric": "sph2pob_iou_pairs_per_sec",
        "value": round(pairs_s),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_s / 1e6 / BASELINE_MPAIRS_S, 2),
    }
    extra = {}
    if os.environ.get("BENCH_EXTRA", "1") == "0":  # smoke-test: primary only
        result["extra"] = extra
        print(json.dumps(result))
        return
    result["extra"] = extra
    extra["partial"] = True  # overwritten by the final full emit
    _checkpoint_partial(result)
    try:
        extra["pairwise_131kx128_pairs_per_sec"] = round(bench_pairwise())
        extra["unbiased_oracle_1m_pairs_seconds"] = round(bench_unbiased(), 4)
    except Exception as e:
        extra["kernel_error"] = f"{type(e).__name__}: {e}"[:200]
    _checkpoint_partial(result)
    try:
        extra.update(bench_consistency())
    except Exception as e:
        extra["consistency_error"] = f"{type(e).__name__}: {e}"[:200]
    _checkpoint_partial(result)
    step_state = None
    try:
        (train_ips, infer_ips, train_dev, infer_dev, mfu,
         step_state) = bench_retinanet()
        extra.update({
            "retinanet_train_imgs_per_sec": round(train_ips, 1),
            "retinanet_train_vs_a100_estimate": round(
                train_ips / A100_TRAIN_IMGS_S, 2),
            "retinanet_infer_imgs_per_sec": round(infer_ips, 1),
            "retinanet_infer_vs_a100_estimate": round(
                infer_ips / A100_INFER_IMGS_S, 2),
            "retinanet_train_device_steady_imgs_per_sec": round(train_dev, 1),
            "retinanet_infer_device_steady_imgs_per_sec": round(infer_dev, 1),
            "config": "RetinaNet-R50-FPN BFoV B=8 512x1024 bf16 max_gt=16",
        })
        if mfu is not None:
            extra["retinanet_train_mfu"] = round(mfu, 3)
    except Exception as e:  # never lose the primary metric to a flaky extra
        extra["error"] = f"{type(e).__name__}: {e}"[:200]
    _checkpoint_partial(result)
    if step_state is not None:
        try:
            (e2e_yuv, host_yuv, e2e_rgb, host_rgb,
             h2d) = bench_e2e_pipeline(*step_state)
            extra["train_e2e_imgs_per_sec"] = round(e2e_yuv, 1)
            extra["train_e2e_rgb_imgs_per_sec"] = round(e2e_rgb, 1)
            extra["host_pipeline_imgs_per_sec"] = round(host_yuv, 1)
            extra["host_pipeline_rgb_imgs_per_sec"] = round(host_rgb, 1)
            extra["host_pipeline_ncpu"] = os.cpu_count()
            extra["h2d_bandwidth_mb_per_sec"] = round(h2d, 1)
        except Exception as e:
            extra["e2e_error"] = f"{type(e).__name__}: {e}"[:200]
    _checkpoint_partial(result)
    try:
        extra.update(bench_kent())
    except Exception as e:
        extra["kent_error"] = f"{type(e).__name__}: {e}"[:200]
    extra.pop("partial", None)
    _checkpoint_partial(result)
    print(json.dumps(result))


def main():
    """Supervise the real bench in a child process.

    The axon tunnel occasionally hangs a whole python process (even
    ``jax.devices()``) and recovers after ~a minute in a *fresh* process
    (see .claude/skills/verify/SKILL.md). Running the benchmark in a
    bounded child and retrying turns a tunnel hiccup into a delay instead
    of a lost BENCH_r*.json. The child's single JSON line is re-emitted
    verbatim; its stderr passes through for logging.
    """
    import tempfile

    attempts = int(os.environ.get("BENCH_ATTEMPTS", "3"))
    attempt_timeout = float(os.environ.get("BENCH_ATTEMPT_TIMEOUT", "1500"))
    retry_wait = float(os.environ.get("BENCH_RETRY_WAIT", "90"))
    partial_file = os.environ.get("BENCH_PARTIAL_FILE") or os.path.join(
        tempfile.gettempdir(), f"sph_retina_bench_partial_{os.getpid()}.json")
    # PIDs recycle: a partial left by a crashed *previous* supervisor run
    # must never be salvaged as this run's result.
    try:
        os.unlink(partial_file)
    except OSError:
        pass

    def _score(p):
        """Richness of a partial: primary metric present + extras count."""
        return (1 if p.get("value") else 0) + len(p.get("extra") or {})

    best_partial = None
    last_err = "no attempts ran"
    for i in range(attempts):
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--run"],
                stdout=subprocess.PIPE, timeout=attempt_timeout,
                cwd=os.path.dirname(os.path.abspath(__file__)),
                env={**os.environ, "BENCH_PARTIAL_FILE": partial_file})
            lines = [l for l in proc.stdout.decode().splitlines() if l.strip()]
            if proc.returncode == 0 and lines:
                parsed = json.loads(lines[-1])  # the one JSON result line
                # refuse to record a non-positive headline (VERDICT r4 #2)
                if not parsed.get("value", 0) > 0:
                    raise json.JSONDecodeError(
                        f"non-positive headline {parsed.get('value')}",
                        lines[-1], 0)
                print(lines[-1])
                try:
                    os.unlink(partial_file)
                except OSError:
                    pass
                return
            last_err = f"rc={proc.returncode}"
        except subprocess.TimeoutExpired:
            last_err = f"timeout after {attempt_timeout:.0f}s (tunnel hang?)"
        except (json.JSONDecodeError, OSError) as e:
            last_err = f"{type(e).__name__}: {e}"[:200]
        # Collect this attempt's checkpoint before the next attempt's early
        # (poorer) checkpoint overwrites it; keep the richest seen.
        try:
            with open(partial_file) as f:
                p = json.loads(f.read())
            if best_partial is None or _score(p) >= _score(best_partial):
                best_partial = p
            os.unlink(partial_file)
        except (OSError, json.JSONDecodeError):
            pass
        print(f"bench attempt {i + 1}/{attempts} failed: {last_err}",
              file=sys.stderr)
        if i + 1 < attempts:
            time.sleep(retry_wait)
    # All attempts failed outright — salvage the richest checkpointed partial
    # (primary metric + whatever extras completed) rather than report zero.
    if best_partial is not None:
        best_partial.setdefault("extra", {})["error"] = (
            f"attempts failed ({last_err}); partial result salvaged")
        print(json.dumps(best_partial))
        return
    print(json.dumps({"metric": "sph2pob_iou_pairs_per_sec", "value": 0,
                      "unit": "pairs/s", "vs_baseline": 0.0,
                      "extra": {"error": f"all attempts failed: {last_err}"}}))


if __name__ == "__main__":
    if "--run" in sys.argv[1:]:
        run_benchmarks()
    else:
        main()
