"""Environment collection for run logs.

Parity with the reference's ``mmdet/utils/collect_env.py`` (logged at the
top of every training run, mmdet/apis/train.py via tools/train.py): one
dict of the facts needed to reproduce or debug a run.
"""

from __future__ import annotations

import platform
import sys


def collect_env() -> dict:
    info: dict = {
        "python": sys.version.replace("\n", " "),
        "platform": platform.platform(),
    }
    try:
        import jax

        info["jax"] = jax.__version__
        try:
            info["backend"] = jax.default_backend()
            info["devices"] = [str(d) for d in jax.devices()]
        except Exception as e:  # backend may be unreachable (tunnel down)
            info["backend_error"] = str(e)[:120]
    except Exception:
        info["jax"] = "unavailable"
    for mod in ("flax", "optax", "orbax.checkpoint", "numpy"):
        try:
            m = __import__(mod)
            info[mod.split(".")[0]] = getattr(m, "__version__", "?")
        except Exception:
            pass
    return info


def env_string(info: dict | None = None) -> str:
    info = info or collect_env()
    return "\n".join(f"{k}: {v}" for k, v in info.items())
