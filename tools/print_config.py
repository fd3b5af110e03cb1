#!/usr/bin/env python
"""Print a fully-resolved config (``_base_`` merged, overrides applied).

Counterpart of /root/reference/tools/analysis_tools/print_config.py.

    python tools/print_config.py configs/sph_retinanet_r50_fpn_120e_indoor360.py \
        --cfg-options optimizer.lr=0.01
"""

from __future__ import annotations

import argparse
import os
import pprint
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--cfg-options", nargs="*", default=None)
    args = p.parse_args()

    from sph_retina_tpu.utils.config import apply_overrides, load_config

    cfg = apply_overrides(load_config(args.config), args.cfg_options)
    pprint.pprint(cfg, sort_dicts=True, width=100)


if __name__ == "__main__":
    main()
