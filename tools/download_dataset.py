"""Download / stage detection datasets (download_dataset parity).

Counterpart of /root/reference/tools/misc/download_dataset.py: fetch the
archives for a named dataset into ``--save-dir``, optionally unzip and
delete them. Differences here:

- stdlib only (urllib + ThreadPool), no torch.hub;
- optional sha256 verification per archive (``"url sha256:<hex>"`` rows);
- a local file path in place of a URL is *staged* (copied) rather than
  renamed away, and works fully offline — the spherical datasets
  (360-Indoor, PANDORA) are distributed through access-gated forms, so
  they are registered with ``gated:`` pseudo-URLs that print the access
  instructions instead of attempting a fetch.

Usage:
    python tools/download_dataset.py --dataset-name coco2017 --save-dir data/coco --unzip
    python tools/download_dataset.py --dataset-name indoor360
    python tools/download_dataset.py --dataset-name local --urls /path/a.zip /path/b.zip --unzip
"""

import argparse
import hashlib
import inspect
import shutil
import tarfile
import urllib.request
import zipfile
from multiprocessing.pool import ThreadPool
from pathlib import Path

DATASETS = {
    "coco2017": [
        "http://images.cocodataset.org/zips/train2017.zip",
        "http://images.cocodataset.org/zips/val2017.zip",
        "http://images.cocodataset.org/zips/test2017.zip",
        "http://images.cocodataset.org/annotations/annotations_trainval2017.zip",  # noqa: E501
    ],
    "voc2007": [
        "http://host.robots.ox.ac.uk/pascal/VOC/voc2007/VOCtrainval_06-Nov-2007.tar",  # noqa: E501
        "http://host.robots.ox.ac.uk/pascal/VOC/voc2007/VOCtest_06-Nov-2007.tar",  # noqa: E501
    ],
    "voc2012": [
        "http://host.robots.ox.ac.uk/pascal/VOC/voc2012/VOCtrainval_11-May-2012.tar",  # noqa: E501
    ],
    "lvis": [
        "https://s3-us-west-2.amazonaws.com/dl.fbaipublicfiles.com/LVIS/lvis_v1_train.json.zip",  # noqa: E501
        "https://s3-us-west-2.amazonaws.com/dl.fbaipublicfiles.com/LVIS/lvis_v1_val.json.zip",  # noqa: E501
    ],
    # Spherical datasets are gated; print how to obtain them.
    "indoor360": [
        "gated:360-Indoor is released through the authors' request form "
        "(https://aliensunmin.github.io/project/360-dataset/). After "
        "approval, stage the archives with --urls <downloaded files>, then "
        "convert annotations with tools/convert_anno.py.",
    ],
    "pandora": [
        "gated:PANDORA is released through the sph2pob authors "
        "(https://github.com/AntXinyuan/sph2pob). Stage the downloaded "
        "archives with --urls <files>, then run tools/convert_anno.py.",
    ],
}


def parse_args():
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--dataset-name", default="coco2017",
                   help=f"one of {sorted(DATASETS)} (or 'local' with --urls)")
    p.add_argument("--save-dir", default="data/coco")
    p.add_argument("--urls", nargs="*", default=None,
                   help="override the registry: explicit URLs or local "
                        "archive paths (each may end with ' sha256:<hex>')")
    p.add_argument("--unzip", action="store_true",
                   help="extract .zip/.tar/.tar.gz archives after staging")
    p.add_argument("--delete", action="store_true",
                   help="delete the archive after extraction")
    p.add_argument("--threads", type=int, default=4)
    return p.parse_args()


def _sha256(path: Path) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for block in iter(lambda: f.read(1 << 20), b""):
            h.update(block)
    return h.hexdigest()


def _extract(f: Path, dst: Path) -> None:
    name = f.name.lower()
    if name.endswith(".zip"):
        zipfile.ZipFile(f).extractall(path=dst)
    elif name.endswith((".tar", ".tar.gz", ".tgz")):
        with tarfile.open(f) as tf:
            # the safe-extraction filter only exists from 3.10.12/3.11.4
            # security backports on; requires-python is >=3.10, so probe.
            if "filter" in inspect.signature(tf.extractall).parameters:
                tf.extractall(path=dst, filter="data")
            else:
                tf.extractall(path=dst)  # noqa: S202 — pre-backport python
    else:
        raise ValueError(f"don't know how to extract {f.name}")


def fetch_one(entry: str, dst_dir: Path, unzip=False, delete=False) -> Path:
    """Stage one archive (URL, local path, or gated notice) into dst_dir."""
    if entry.startswith("gated:"):
        print(entry[len("gated:"):])
        return dst_dir
    url, _, digest = entry.partition(" sha256:")
    url = url.strip()
    src = Path(url)
    f = dst_dir / src.name
    if src.is_file():
        if src.resolve() != f.resolve():
            shutil.copy2(src, f)  # stage, don't move the user's copy
    elif not f.exists():
        print(f"Downloading {url} -> {f}")
        urllib.request.urlretrieve(url, f)
    if digest:
        got = _sha256(f)
        if got != digest.strip():
            raise RuntimeError(
                f"{f.name}: sha256 mismatch (got {got}, want {digest})")
    if unzip:
        print(f"Extracting {f.name}")
        _extract(f, dst_dir)
        if delete:
            f.unlink()
    return f


def main():
    args = parse_args()
    entries = args.urls
    if not entries:
        if args.dataset_name not in DATASETS:
            raise SystemExit(
                f"unknown dataset {args.dataset_name!r}; known: "
                f"{sorted(DATASETS)} (or pass --urls)")
        entries = DATASETS[args.dataset_name]
    dst = Path(args.save_dir)
    dst.mkdir(parents=True, exist_ok=True)
    if args.threads > 1 and len(entries) > 1:
        with ThreadPool(args.threads) as pool:
            pool.starmap(fetch_one, [(e, dst, args.unzip, args.delete)
                                     for e in entries])
    else:
        for e in entries:
            fetch_one(e, dst, args.unzip, args.delete)
    print(f"staged {args.dataset_name} in {dst}")


if __name__ == "__main__":
    main()
