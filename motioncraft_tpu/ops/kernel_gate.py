"""Process-local gate to disable Pallas kernels in a dynamic extent.

``jax.default_backend()`` says "tpu" even while computing on a host-CPU
device via ``jax.default_device`` — e.g. during Architecture.init, which
deliberately runs the eager flax init forward on CPU.  Kernel-dispatch
helpers consult this gate so such regions fall back to the XLA paths.
"""

from __future__ import annotations

import contextlib

_DISABLED = False


@contextlib.contextmanager
def no_pallas():
    global _DISABLED
    old = _DISABLED
    _DISABLED = True
    try:
        yield
    finally:
        _DISABLED = old


def pallas_disabled() -> bool:
    return _DISABLED
