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


def enable_compilation_cache(path: str = "~/.cache/motioncraft_jax_cache",
                             min_compile_secs: float = 5.0) -> None:
    """Turn on JAX's persistent compilation cache.

    Mosaic/Pallas kernels compile in minutes through remote-AOT TPU runtimes
    (axon tunnel); caching executables on disk makes every process after the
    first start in seconds.  Safe to call multiple times; harmless on CPU.
    """
    import os

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", os.path.expanduser(path))
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          min_compile_secs)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # older jax without these flags: cache is best-effort
        pass
