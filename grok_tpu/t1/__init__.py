"""Tier-1 entropy coding backends.

- ebcot_np: lane-parallel numpy reference (bit-exact, used by tests)
- native:   C++ batched coder (fast host path; bit-identical to ebcot_np)
- ebcot_jax: device (TPU) lockstep coder

select_backend() resolves the implementation: GROK_TPU_T1 env var
("native" | "numpy" | "jax") or native-if-available.
"""

from __future__ import annotations

import os


def select_backend(name: str | None = None):
    """Returns a module exposing encode_cblks/decode_cblks."""
    name = name or os.environ.get("GROK_TPU_T1", "auto")
    if name in ("native", "auto"):
        from . import native

        if native.available():
            return native
        if name == "native":
            raise RuntimeError("native T1 backend unavailable (no compiler?)")
    if name == "jax":
        from . import ebcot_jax

        return ebcot_jax
    from . import ebcot_np

    return ebcot_np
