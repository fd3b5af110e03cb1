"""Contract test for the driver-facing bench entry point.

The driver runs ``python bench.py`` at the end of every round and records
its ONE JSON line. This drives the real supervisor → child → JSON chain in
subprocesses (on the CPU backend, tiny sizes) so a regression in either
layer is caught before it costs a recorded benchmark.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(env_extra, timeout=420):
    env = dict(os.environ, BENCH_PLATFORM="cpu", BENCH_N="5000",
               BENCH_ITERS="10", BENCH_EXTRA="0")
    env.update(env_extra)
    proc = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                          stdout=subprocess.PIPE, timeout=timeout, env=env,
                          cwd=REPO)
    lines = [l for l in proc.stdout.decode().splitlines() if l.strip()]
    assert proc.returncode == 0 and lines, proc.stdout
    return json.loads(lines[-1])


def test_marginal_seconds_discards_inversions():
    """One tunnel-jitter inversion (t_long < t_short) produced the negative
    round-4 headline; the estimator must discard it and answer with the
    median of the positive estimates (VERDICT r4 item 2)."""
    sys.path.insert(0, REPO)
    import bench

    calls = iter([1.0, 0.5,      # inversion -> negative marginal, discarded
                  0.2, 1.0,      # (1.0-0.2)/8 = 0.1
                  0.3, 1.18,     # 0.11
                  0.25, 0.97])   # 0.09
    est = bench._marginal_seconds(lambda n: next(calls), 2, 10, trials=3)
    assert abs(est - 0.1) < 1e-9

    # all-inversion pathology: raises instead of emitting garbage
    bad = iter([1.0, 0.5] * 9)
    try:
        bench._marginal_seconds(lambda n: next(bad), 2, 10, trials=3)
        raise AssertionError("expected RuntimeError")
    except RuntimeError:
        pass


def test_bench_emits_one_json_line():
    out = _run({"BENCH_ATTEMPTS": "1", "BENCH_ATTEMPT_TIMEOUT": "400"})
    assert out["metric"] == "sph2pob_iou_pairs_per_sec"
    assert out["unit"] == "pairs/s"
    assert out["value"] > 0
    assert "vs_baseline" in out and "extra" in out


def test_bench_supervisor_survives_hung_child():
    """A child that never finishes must still yield a JSON line (the
    tunnel-hang failure mode the supervisor exists for)."""
    out = _run({"BENCH_ATTEMPTS": "1", "BENCH_ATTEMPT_TIMEOUT": "3",
                # huge N on CPU: guaranteed to blow the 3 s attempt budget
                "BENCH_N": "2000000", "BENCH_ITERS": "100",
                "BENCH_RETRY_WAIT": "1"}, timeout=120)
    assert out["value"] == 0
    assert "error" in out["extra"]


def test_bench_salvages_partial_on_timeout():
    """A child killed mid-extras must still yield the checkpointed primary
    metric (partial salvage), not a zero result."""
    out = _run({"BENCH_ATTEMPTS": "1", "BENCH_ATTEMPT_TIMEOUT": "90",
                "BENCH_RETRY_WAIT": "1",
                # extras on: the 131k x 128 pairwise bench cannot finish
                # inside 90 s on the single-core CPU backend, so the child
                # dies after checkpointing the primary metric
                "BENCH_EXTRA": "1"}, timeout=240)
    assert out["value"] > 0
    assert out["extra"].get("partial") is True
    assert "salvaged" in out["extra"]["error"]


def test_bench_never_salvages_stale_partial(tmp_path):
    """A partial file left by a *previous* (crashed) supervisor run — same
    path via PID recycling — must not be reported as this run's result."""
    stale = {"metric": "sph2pob_iou_pairs_per_sec", "value": 999999,
             "unit": "pairs/s", "vs_baseline": 9.59,
             "extra": {"partial": True}}
    pf = tmp_path / "partial.json"
    pf.write_text(json.dumps(stale))
    out = _run({"BENCH_ATTEMPTS": "1", "BENCH_ATTEMPT_TIMEOUT": "3",
                # huge N on CPU: the child hangs past the 3 s budget and
                # never checkpoints (BENCH_EXTRA=0 skips checkpointing too)
                "BENCH_N": "2000000", "BENCH_ITERS": "100",
                "BENCH_RETRY_WAIT": "1", "BENCH_PARTIAL_FILE": str(pf)},
               timeout=120)
    assert out["value"] == 0  # honest zero+error, not the stale 999999
    assert "error" in out["extra"]
    assert not pf.exists()  # the stale file was cleared at supervisor start
