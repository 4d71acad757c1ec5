"""DWT unit tests: roundtrips over sizes/parities, numpy==jax bit-exactness."""

import numpy as np
import pytest

from grok_tpu.core.rect import Rect
from grok_tpu.ops import dwt

CASES = [
    (64, 64, 0, 0, 5),
    (37, 53, 3, 7, 4),
    (1, 17, 0, 0, 3),
    (5, 1, 1, 1, 2),
    (256, 256, 0, 0, 5),
    (33, 33, 11, 5, 6),
    (4, 4, 1, 0, 2),
    (130, 70, 64, 64, 5),
]


@pytest.mark.parametrize("h,w,x0,y0,lv", CASES)
def test_53_roundtrip_exact(h, w, x0, y0, lv, rng):
    a = rng.integers(-4096, 4096, size=(h, w)).astype(np.int32)
    r = Rect(x0, y0, x0 + w, y0 + h)
    f = dwt.forward(np, a.copy(), r, lv, False)
    b = dwt.inverse(np, f.copy(), r, lv, False)
    assert np.array_equal(a, b)


@pytest.mark.parametrize("h,w,x0,y0,lv", CASES)
def test_97_roundtrip_close(h, w, x0, y0, lv, rng):
    a = rng.integers(-255, 256, size=(h, w)).astype(np.float32)
    r = Rect(x0, y0, x0 + w, y0 + h)
    f = dwt.forward(np, a.copy(), r, lv, True)
    b = dwt.inverse(np, f.copy(), r, lv, True)
    assert np.abs(a - b).max() < 1e-2


def test_jax_matches_numpy_53(rng):
    import jax.numpy as jnp

    a = rng.integers(-4096, 4096, size=(64, 96)).astype(np.int32)
    r = Rect(0, 0, 96, 64)
    f_np = dwt.forward(np, a.copy(), r, 5, False)
    f_jx = np.asarray(dwt.forward(jnp, jnp.asarray(a), r, 5, False))
    assert np.array_equal(f_np, f_jx)
    b_jx = np.asarray(dwt.inverse(jnp, jnp.asarray(f_np), r, 5, False))
    assert np.array_equal(a, b_jx)
