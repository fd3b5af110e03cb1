"""High-level inference API (reference mmdet/apis/inference.py parity)."""

import numpy as np

from sph_retina_tpu.apis import inference_detector, init_detector, show_result

TINY_CFG = {
    "model": {"type": "SphRetinaNet", "num_classes": 3,
              "backbone": {"depth": 18}},
    "img_size": (64, 128),
    "bf16": False,
}


def test_init_and_inference_single_image():
    det = init_detector(TINY_CFG, checkpoint=None,
                        cfg_options=["model.num_classes=3"])
    img = (np.random.RandomState(0).rand(80, 160, 3) * 255).astype(np.uint8)
    result = inference_detector(det, img)

    # reference format: list of num_classes arrays, (n_i, box_version + 1)
    assert isinstance(result, list) and len(result) == 3
    for arr in result:
        assert arr.ndim == 2 and arr.shape[1] == det.box_version + 1
        if len(arr):
            b = arr[:, :-1]
            assert (b[:, 0] >= 0).all() and (b[:, 0] <= 360).all()
            assert (arr[:, -1] >= 0).all() and (arr[:, -1] <= 1).all()


def test_inference_batch_and_grayscale():
    det = init_detector(TINY_CFG)
    rs = np.random.RandomState(1)
    imgs = [
        (rs.rand(64, 128, 3) * 255).astype(np.uint8),
        (rs.rand(100, 180) * 255).astype(np.uint8),  # grayscale -> 3ch
    ]
    results = inference_detector(det, imgs)
    assert len(results) == 2
    assert all(len(r) == 3 for r in results)


def test_show_result_renders(tmp_path):
    det = init_detector(TINY_CFG)
    img = (np.random.RandomState(2).rand(64, 128, 3) * 255).astype(np.uint8)
    result = inference_detector(det, img)
    out_file = tmp_path / "vis.png"
    out = show_result(det, img, result, score_thr=0.0, out_file=str(out_file))
    assert out.shape == (64, 128, 3) and out.dtype == np.uint8
    assert out_file.exists()


def test_inference_accepts_float_image_needing_resize():
    """Docstring-allowed float arrays must survive the PIL resize path
    (regression: Image.fromarray rejects float RGB)."""
    det = init_detector(TINY_CFG)
    img = np.random.RandomState(3).rand(80, 160, 3) * 255.0  # float64, off-size
    result = inference_detector(det, img)
    assert isinstance(result, list) and len(result) == 3
