"""Device-resident tile transform pipeline (jax/XLA).

One jitted function per tile geometry runs DC shift -> MCT -> DWT ->
quantization (encode) or dequantization -> inverse DWT -> inverse MCT ->
final conversion (decode) entirely on the accelerator; only entropy-coded
bytes cross the host boundary when combined with the jax T1 backend.

Enabled with GROK_TPU_DEVICE=jax (tile_processor checks it); the band
geometry is closed over at trace time so every slice is static and XLA
fuses the whole chain. Parity: the numpy stages in tile_processor.py.

Both chains are bit-exact vs the host path ON TPU: 5/3 by integer
arithmetic everywhere; 9/7 because the TPU VPU rounds f32 mul-then-add
exactly like the host's two-rounding sequence (no FMA contraction on the
float elementwise path) — verified on the attached chip by
tools/fma_hw_check.py (encode streams byte-identical, decode samples
identical, incl. ICT and custom MCT). The CPU simulation backend may
drift +-1 LSB on rare samples: LLVM contracts mul+add into FMAs during
XLA:CPU codegen, and `lax.optimization_barrier` cannot prevent it (it is
stripped from the compiled HLO before emission — measured, see
tools/fma_hw_check.py docstring).
"""

from __future__ import annotations

import numpy as np

from . import dwt as dwt_ops
from . import mct as mct_ops


def _band_origin(geom, res_idx: int, orient: int):
    if orient == 0:
        return 0, 0
    prev = geom.resolutions[res_idx - 1].rect
    if orient == 1:
        return 0, prev.width
    if orient == 2:
        return prev.height, 0
    return prev.height, prev.width


def make_forward_fn(geoms, tccps, siz_comps, mct: int,
                    mct_enc_matrix=None):
    """Un-jitted forward transform fn(*comps) (see build_forward)."""
    import jax
    import jax.numpy as jnp

    ncomp = len(geoms)
    irrev = tccps[0].irreversible
    band_specs = []
    for g, tccp in zip(geoms, tccps):
        specs = []
        for res in g.resolutions:
            for band in res.bands:
                oy, ox = _band_origin(g, res.r, band.orient)
                specs.append((oy, ox, band.rect.height, band.rect.width,
                              float(band.step)))
        band_specs.append((specs, tccp.roi_shift))

    dcs = [0 if c.signed else 1 << (c.prec - 1) for c in siz_comps]
    nls = [t.num_resolutions - 1 for t in tccps]
    rects = [g.rect for g in geoms]

    enc_m = (np.asarray(mct_enc_matrix, dtype=np.float32)
             if mct == 2 and mct_enc_matrix is not None else None)

    def f(*comps):
        shifted = [comps[c] - dcs[c] for c in range(ncomp)]
        if mct == 2 and enc_m is not None:
            # Part-2 array-based MCT (float path, parity:
            # tile_processor custom_mct_forward) — a [N,N] matmul over
            # the component axis, MXU-native
            flat = jnp.stack(
                [x.astype(jnp.float32) for x in shifted]
            ).reshape(ncomp, -1)
            mixed = jnp.asarray(enc_m) @ flat
            shifted = [mixed[c].reshape(shifted[c].shape)
                       for c in range(ncomp)]
        elif mct == 1 and ncomp >= 3:
            if irrev:
                r, g, b = (x.astype(jnp.float32) for x in shifted[:3])
                y, cb, cr = mct_ops.ict_forward(jnp, r, g, b)
                shifted = [y, cb, cr, *shifted[3:]]
            else:
                y, cb, cr = mct_ops.rct_forward(jnp, *shifted[:3])
                shifted = [y, cb, cr, *shifted[3:]]
        outs = []
        for c in range(ncomp):
            a = shifted[c]
            if irrev:
                a = a.astype(jnp.float32)
            packed = dwt_ops.forward(jnp, a, rects[c], nls[c], irrev)
            if irrev:
                specs, roi = band_specs[c]
                q = jnp.zeros(packed.shape, dtype=jnp.int32)
                for (oy, ox, bh, bw, step) in specs:
                    vals = jax.lax.dynamic_slice(packed, (oy, ox), (bh, bw))
                    qb = (jnp.sign(vals)
                          * jnp.floor(jnp.abs(vals) / jnp.float32(step))
                          ).astype(jnp.int32)
                    q = jax.lax.dynamic_update_slice(q, qb, (oy, ox))
                if roi:
                    q = q << roi
                outs.append(q)
            else:
                specs, roi = band_specs[c]
                outs.append(packed << roi if roi else packed)
        return tuple(outs)

    return f


def _pin_device(fn):
    """Honor GROK_TPU_DEVICE_ID (CLI -G DeviceId parity): run the jitted
    program on the selected device instead of jax's default."""
    import os

    did = os.environ.get("GROK_TPU_DEVICE_ID", "")
    if not did:
        return fn
    import jax

    dev = jax.devices()[int(did)]

    def wrapped(*a):
        with jax.default_device(dev):
            return fn(*a)

    return wrapped


def build_forward(geoms, tccps, siz_comps, mct: int, mct_enc_matrix=None):
    """Returns jitted fn(*comps int32 [H,W]) -> tuple of packed int32 arrays.

    Band steps/ROI must already be applied to the geometry (apply_band_quant).
    """
    import jax

    return _pin_device(jax.jit(make_forward_fn(
        geoms, tccps, siz_comps, mct, mct_enc_matrix=mct_enc_matrix)))


def make_inverse_fn(geoms, tccps, siz_comps, mct: int, reduce: int = 0,
                    mct_dec_matrix=None, mct_offsets=None):
    """Un-jitted inverse transform fn(*staging) (see build_inverse)."""
    import jax
    import jax.numpy as jnp

    ncomp = len(geoms)
    irrev = tccps[0].irreversible
    band_specs = []
    for g, tccp in zip(geoms, tccps):
        top = max(g.num_resolutions - 1 - reduce, 0)
        specs = []
        for res in g.resolutions[: top + 1]:
            for band in res.bands:
                oy, ox = _band_origin(g, res.r, band.orient)
                specs.append((oy, ox, band.rect.height, band.rect.width,
                              float(band.step)))
        band_specs.append((specs, tccp.roi_shift))
    nls = [max(t.num_resolutions - 1 - reduce, 0) for t in tccps]
    rects = [g.rect.ceil_div_pow2(reduce) if reduce else g.rect for g in geoms]
    dec_m = (np.asarray(mct_dec_matrix, dtype=np.float32)
             if mct == 2 and mct_dec_matrix is not None else None)

    def f(*staging):
        outs = []
        for c in range(ncomp):
            a = staging[c]
            specs, roi = band_specs[c]
            if roi:
                mag = jnp.abs(a)
                thresh = 1 << roi
                mag = jnp.where(mag >= thresh, mag >> roi, mag)
                a = jnp.where(a < 0, -mag, mag)
            if irrev:
                deq = jnp.zeros(a.shape, dtype=jnp.float32)
                for (oy, ox, bh, bw, step) in specs:
                    qv = jax.lax.dynamic_slice(a, (oy, ox), (bh, bw)).astype(
                        jnp.float32
                    )
                    m = jnp.abs(qv)
                    rec = jnp.where(
                        m > 0, (m + jnp.float32(0.5)) * jnp.float32(step), 0.0
                    )
                    deq = jax.lax.dynamic_update_slice(
                        deq, jnp.where(qv < 0, -rec, rec), (oy, ox)
                    )
                a = deq
            outs.append(dwt_ops.inverse(jnp, a, rects[c], nls[c], irrev))
        if mct == 2 and dec_m is not None:
            flat = jnp.stack(
                [o.astype(jnp.float32) for o in outs]
            ).reshape(ncomp, -1)
            mixed = jnp.asarray(dec_m) @ flat
            outs = [mixed[c].reshape(outs[c].shape) for c in range(ncomp)]
        elif mct == 1 and ncomp >= 3:
            if irrev:
                r, g, b = mct_ops.ict_inverse(jnp, outs[0], outs[1], outs[2])
            else:
                r, g, b = mct_ops.rct_inverse(jnp, outs[0], outs[1], outs[2])
            outs = [r, g, b, *outs[3:]]
        final = []
        for c in range(ncomp):
            a = outs[c]
            prec = siz_comps[c].prec
            signed = siz_comps[c].signed
            lo = -(1 << (prec - 1)) if signed else 0
            hi = (1 << (prec - 1)) - 1 if signed else (1 << prec) - 1
            if irrev:
                off = 0.0 if signed else float(1 << (prec - 1))
                if mct == 2 and mct_offsets is not None:
                    off = float(mct_offsets[c])
                a = jnp.clip(
                    jnp.floor(a + jnp.float32(0.5 + off)), lo, hi
                ).astype(jnp.int32)
            else:
                a = jnp.clip(a + (0 if signed else 1 << (prec - 1)), lo, hi)
            final.append(a.astype(jnp.int32))
        return tuple(final)

    return f


def build_inverse(geoms, tccps, siz_comps, mct: int, reduce: int = 0,
                  mct_dec_matrix=None, mct_offsets=None):
    """Returns jitted fn(*staging int32 packed) -> tuple of final int32."""
    import jax

    return _pin_device(
        jax.jit(make_inverse_fn(geoms, tccps, siz_comps, mct, reduce,
                                mct_dec_matrix=mct_dec_matrix,
                                mct_offsets=mct_offsets))
    )


def device_enabled() -> bool:
    import os

    return os.environ.get("GROK_TPU_DEVICE", "") == "jax"
