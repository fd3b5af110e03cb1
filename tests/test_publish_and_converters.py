"""Published checkpoints + dataset converter utilities.

Parity: tools/model_converters/publish_model.py, tools/misc/split_coco.py,
tools/dataset_converters/images2coco.py, tools/misc/get_image_metas.py in
the reference.
"""

import json
import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from utils.synthetic_coco import write_synthetic_coco  # noqa: E402

from sph_retina_tpu.utils.publish import (  # noqa: E402
    load_published,
    save_published,
)

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def _run(args, timeout=600):
    p = subprocess.run(
        [sys.executable] + args, cwd=REPO, timeout=timeout,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env={**os.environ, "XLA_FLAGS": ""})
    assert p.returncode == 0, p.stdout[-4000:]
    return p.stdout


def test_publish_roundtrip(tmp_path):
    params = {"backbone": {"conv1": {"kernel": np.ones((3, 3, 3, 8),
                                                       np.float32)}},
              "head": {"bias": np.arange(4, dtype=np.float32)}}
    stats = {"bn": {"mean": np.zeros(8, np.float32)}}
    final = save_published(str(tmp_path / "model.npz"), params, stats,
                           meta={"step": 7})
    assert os.path.exists(final) and "-" in os.path.basename(final)
    p2, s2, meta = load_published(final)
    assert meta["step"] == 7
    np.testing.assert_array_equal(p2["backbone"]["conv1"]["kernel"],
                                  params["backbone"]["conv1"]["kernel"])
    np.testing.assert_array_equal(p2["head"]["bias"], params["head"]["bias"])
    np.testing.assert_array_equal(s2["bn"]["mean"], stats["bn"]["mean"])
    # hash suffix is stable for identical content
    final2 = save_published(str(tmp_path / "model2.npz"), params, stats,
                            meta={"step": 7})
    assert final.split("-")[-1] == final2.split("-")[-1]


def test_init_detector_accepts_published_npz(tmp_path):
    import jax
    import jax.numpy as jnp

    from sph_retina_tpu.apis import init_detector
    from sph_retina_tpu.engine.zoo import get_family

    cfg = {"model": {"type": "SphRetinaNet", "num_classes": 3,
                     "backbone": {"depth": 18}},
           "img_size": (64, 128), "bf16": False}
    family = get_family(cfg)
    model, _ = family.build(cfg)
    variables = family.init(model, jax.random.PRNGKey(3),
                            jnp.zeros((1, 64, 128, 3)))
    final = save_published(str(tmp_path / "pub.npz"),
                           jax.tree_util.tree_map(np.asarray,
                                                  variables["params"]),
                           jax.tree_util.tree_map(
                               np.asarray, variables.get("batch_stats", {})))
    det = init_detector(cfg, checkpoint=final)
    leaf = jax.tree_util.tree_leaves(det.variables["params"])[0]
    ref = jax.tree_util.tree_leaves(variables["params"])[0]
    np.testing.assert_array_equal(np.asarray(leaf), np.asarray(ref))


def test_split_coco(tmp_path):
    ann, _ = write_synthetic_coco(str(tmp_path / "d"), n_images=10,
                                  num_classes=3)
    out = _run(["tools/split_coco.py", ann, str(tmp_path / "splits"),
                "--labeled-percent", "20", "--fold", "2"])
    files = sorted(os.listdir(tmp_path / "splits"))
    assert len(files) == 4  # 2 folds x (labeled + unlabeled)
    lab = json.loads((tmp_path / "splits" /
                      "instances_train.1@20.json").read_text())
    unlab = json.loads((tmp_path / "splits" /
                        "instances_train.1@20-unlabeled.json").read_text())
    assert len(lab["images"]) == 2 and len(unlab["images"]) == 8
    assert unlab["annotations"] == []
    lab_ids = {im["id"] for im in lab["images"]}
    assert all(a["image_id"] in lab_ids for a in lab["annotations"])
    assert out.count(".json") == 4


def test_images2coco_and_get_image_metas(tmp_path):
    _, img_dir = write_synthetic_coco(str(tmp_path / "d"), n_images=3,
                                      num_classes=2)
    classes = tmp_path / "classes.txt"
    classes.write_text("toilet\nperson\n")
    out_json = tmp_path / "unlabeled.json"
    _run(["tools/images2coco.py", img_dir, str(classes), str(out_json)])
    coco = json.loads(out_json.read_text())
    assert len(coco["images"]) == 3 and coco["annotations"] == []
    assert [c["name"] for c in coco["categories"]] == ["toilet", "person"]
    assert coco["images"][0]["width"] == 128

    metas_path = tmp_path / "metas.json"
    _run(["tools/get_image_metas.py", "--ann-file", str(out_json),
          "--img-prefix", img_dir, "--out", str(metas_path)])
    metas = json.loads(metas_path.read_text())
    assert len(metas) == 3
    assert metas[0]["width"] == 128 and metas[0]["height"] == 64


def test_pascal_voc_converter_roundtrip(tmp_path):
    """VOC XML -> spherical COCO JSON loadable by SphCocoDataset."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "pascal_voc", os.path.join(REPO, "tools", "pascal_voc.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    xml = """<annotation><filename>{f}</filename>
    <size><width>400</width><height>200</height></size>
    <object><name>person</name><difficult>0</difficult>
      <bndbox><xmin>101</xmin><ymin>51</ymin><xmax>201</xmax><ymax>101</ymax></bndbox>
    </object>
    <object><name>dog</name><difficult>1</difficult>
      <bndbox><xmin>1</xmin><ymin>1</ymin><xmax>41</xmax><ymax>21</ymax></bndbox>
    </object></annotation>"""
    xml_dir = tmp_path / "ann"
    xml_dir.mkdir()
    for i in range(2):
        (xml_dir / f"img{i}.xml").write_text(xml.format(f=f"img{i}.jpg"))
    out = tmp_path / "voc.json"
    res = mod.convert(str(xml_dir), str(out))
    assert len(res["images"]) == 2 and len(res["annotations"]) == 4

    # person box: pixel (100,50)-(200,100) on 400x200 -> BFoV degrees
    person = res["annotations"][0]
    np.testing.assert_allclose(person["bbox"], [135.0, 67.5, 90.0, 45.0])
    assert person["iscrowd"] == 0
    assert res["annotations"][1]["iscrowd"] == 1  # difficult -> ignored

    from sph_retina_tpu.data import SphCocoDataset

    ds = SphCocoDataset(ann_file=str(out))
    assert len(ds) == 2 and ds.num_classes == 20
    item = ds[0]
    assert item["boxes"].shape == (1, 4)  # difficult one skipped
    np.testing.assert_allclose(item["boxes"][0], [135.0, 67.5, 90.0, 45.0])


def test_save_published_without_npz_suffix(tmp_path):
    """A suffix-less out path must not crash after np.savez appends .npz
    (regression: FileNotFoundError at the hash/rename step)."""
    import numpy as np

    from sph_retina_tpu.utils.publish import load_published, save_published

    params = {"w": np.arange(4, dtype=np.float32)}
    final = save_published(str(tmp_path / "model"), params, {}, {"a": 1})
    assert final.endswith(".npz") and "-" in final
    loaded, _, meta = load_published(final)
    np.testing.assert_array_equal(loaded["w"], params["w"])
    assert meta == {"a": 1}

def test_cityscapes_converter(tmp_path):
    """gtFine instance-id map -> spherical COCO JSON, no cityscapesscripts."""
    import importlib.util

    from PIL import Image

    spec = importlib.util.spec_from_file_location(
        "cityscapes", os.path.join(REPO, "tools", "cityscapes.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    h, w = 100, 200
    inst = np.zeros((h, w), np.int32)
    inst[:10, :20] = 7            # stuff label (< 24): ignored
    inst[20:40, 40:80] = 26000    # car instance
    inst[50:60, 100:120] = 24     # person crowd region (id < 1000)
    inst[5:15, 150:170] = 24      # second, DISJOINT person crowd region
    inst[70:90, 150:190] = 33002  # bicycle instance
    gt = tmp_path / "gtFine" / "aachen"
    gt.mkdir(parents=True)
    Image.fromarray(inst, mode="I").save(
        gt / "aachen_000000_gtFine_instanceIds.png")

    out = tmp_path / "cs.json"
    res = mod.convert(str(tmp_path / "gtFine"), str(out))
    assert len(res["images"]) == 1
    img = res["images"][0]
    assert img["file_name"] == os.path.join(
        "aachen", "aachen_000000_leftImg8bit.png")
    assert img["width"] == w and img["height"] == h

    anns = sorted(res["annotations"], key=lambda a: a["category_id"])
    # disjoint crowd pixels of one label split into separate iscrowd
    # records (reference: one record per crowd polygon), never one box
    # spanning both regions
    assert [a["category_id"] for a in anns] == [1, 1, 3, 8]
    assert [a["iscrowd"] for a in anns] == [1, 1, 0, 0]
    crowd_widths = sorted(a["bbox"][2] for a in anns[:2])
    assert crowd_widths == [20 / w * 360.0, 20 / w * 360.0]
    # car pixel box (40,20)-(80,40) on 200x100 -> BFoV degrees
    np.testing.assert_allclose(anns[2]["bbox"], [108.0, 54.0, 72.0, 36.0])
    assert anns[2]["area"] == 20 * 40

    from sph_retina_tpu.data import SphCocoDataset

    ds = SphCocoDataset(ann_file=str(out))
    assert ds.num_classes == 8
    assert ds[0]["boxes"].shape == (2, 4)  # crowd regions skipped
