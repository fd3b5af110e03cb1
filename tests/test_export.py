"""StableHLO export round trip (serving-path analogue of the reference's
ONNX export tests, /root/reference/tests/test_onnx/)."""

import numpy as np

from sph_retina_tpu.apis import init_detector
from sph_retina_tpu.export import export_predict, load_exported

TINY_CFG = {
    "model": {"type": "SphRetinaNet", "num_classes": 3,
              "backbone": {"depth": 18}},
    "img_size": (64, 128),
    "bf16": False,
}


def test_export_roundtrip_matches_live_predict():
    det = init_detector(TINY_CFG)
    blob = export_predict(det, batch_size=2)
    assert isinstance(blob, bytes) and len(blob) > 1000

    call = load_exported(blob)
    rs = np.random.RandomState(0)
    images = rs.rand(2, 64, 128, 3).astype(np.float32)

    got = call(images)
    ref = det.predict(det.variables, images)
    for g, r in zip(got, tuple(ref)):
        np.testing.assert_allclose(np.asarray(g, np.float32),
                                   np.asarray(r, np.float32),
                                   rtol=1e-5, atol=1e-5)


def test_export_bakes_weights():
    """Two detectors with different weights must export different artifacts
    producing different scores (weights are constants in the module)."""
    det1 = init_detector(TINY_CFG, seed=0)
    det2 = init_detector(TINY_CFG, seed=1)
    img = np.random.RandomState(1).rand(1, 64, 128, 3).astype(np.float32)
    # compare decoded boxes: scores are masked to 0 for empty detections,
    # but the (unmasked) top-k decoded boxes depend on the weights
    b1 = np.asarray(load_exported(export_predict(det1))(img)[0])
    b2 = np.asarray(load_exported(export_predict(det2))(img)[0])
    assert not np.allclose(b1, b2)
