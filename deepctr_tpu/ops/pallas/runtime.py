"""Interpret-mode policy for the Pallas kernels.

Kernels auto-select interpreter mode off-TPU so CPU CI exercises the exact
kernel code (SURVEY.md §5 sanitizer row).  The auto-detection keys off
``jax.default_backend()`` — correct in-process, but wrong when a CPU device
mesh is used while a TPU backend is registered as the default (the
``dryrun_multichip`` scenario under the axon boot, where JAX_PLATFORMS=cpu
is overridden by the plugin's sitecustomize).  ``set_force_interpret``
overrides the auto-detection for such callers, keyed off the devices the
computation will actually run on.
"""

from __future__ import annotations

import jax

_FORCE_INTERPRET: bool | None = None


def set_force_interpret(force: bool | None) -> None:
    """Override interpret auto-detection (None restores auto)."""
    global _FORCE_INTERPRET
    _FORCE_INTERPRET = force


def default_interpret() -> bool:
    """True -> run Pallas kernels in interpreter mode."""
    if _FORCE_INTERPRET is not None:
        return _FORCE_INTERPRET
    return jax.default_backend() != "tpu"
