"""Environment report (reference mogen/utils/collect_env.py)."""

from __future__ import annotations

import platform
import sys


def collect_env() -> dict:
    info = {"python": sys.version.replace("\n", " "),
            "platform": platform.platform()}
    import numpy
    info["numpy"] = numpy.__version__
    try:
        import jax
        info["jax"] = jax.__version__
        info["jax_backend"] = jax.default_backend()
        info["devices"] = ", ".join(str(d) for d in jax.devices())
    except Exception as e:  # pragma: no cover
        info["jax"] = f"unavailable ({e})"
    for mod in ("flax", "optax", "orbax.checkpoint", "scipy"):
        try:
            m = __import__(mod)
            info[mod] = getattr(m, "__version__", "?")
        except ImportError:
            info[mod] = "not installed"
    import motioncraft_tpu
    info["motioncraft_tpu"] = motioncraft_tpu.__version__
    return info


if __name__ == "__main__":
    for k, v in collect_env().items():
        print(f"{k}: {v}")
