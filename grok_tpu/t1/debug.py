"""Plugin/backend debug-state interface.

Capability parity with the reference's plugin debug machinery
(/root/reference/src/lib/jp2/plugin/plugin_interface.h:33-51
`grk_plugin_debug_mqc` + GRK_PLUGIN_STATE_DEBUG consumed at
tile/TileProcessor.cpp:204-232): the host captures the MQ coder's
(context, decision) stream and bit-checks an accelerated backend against
its own coding, decision by decision.

Two entry points:

- ``capture_cxd(...)``: per-codeblock (context, decision) streams from the
  lane-parallel reference coder — the ``contextStream`` analogue. Each
  stream is a uint8 array of packed ``(ctx << 1) | d``.
- ``DebugVerifyBackend``: wraps any T1 backend; every encode/decode batch
  is re-run on the numpy reference coder and compared. On mismatch it
  reports the diverging blocks, the first differing codeword byte, and the
  tail of the oracle's CxD stream around the divergence (the
  ``contextCache`` analogue), then raises. Enable globally with
  ``GROK_TPU_T1_DEBUG=1`` — the production mirror of the reference's
  GRK_PLUGIN_STATE_DEBUG mode (plugin codes, host verifies).
"""

from __future__ import annotations

import numpy as np

from ..core import logging as log
from ..core.errors import GrokTpuError

#: how many trailing CxD pairs to include in a mismatch report
#: (reference contextCache is 3 deep; we report a wider window)
CXD_CACHE = 16


def capture_cxd(coeffs, heights, widths, orients, styles=None):
    """Encode with the reference coder, returning (result, cxd_streams).

    cxd_streams: list of N uint8 arrays, one per codeblock, each the
    packed (ctx << 1 | d) MQ decision stream for that block (raw BYPASS
    bits are not context-coded and are excluded, as in the reference)."""
    from . import ebcot_np

    sink: list = []
    res = ebcot_np.encode_cblks(
        np.asarray(coeffs), np.asarray(heights), np.asarray(widths),
        np.asarray(orients), styles=styles, cxd_capture=sink)
    n = coeffs.shape[0]
    streams = []
    for lane in range(n):
        vals = [
            (int(ctx[lane]) << 1) | int(d[lane])
            for (ctx, d, mask) in sink if mask[lane]
        ]
        streams.append(np.asarray(vals, dtype=np.uint8))
    return res, streams


class BackendMismatch(GrokTpuError):
    """An accelerated T1 backend diverged from the reference coder."""


class DebugVerifyBackend:
    """Wrap a T1 backend so every batch is bit-checked against ebcot_np."""

    def __init__(self, backend, name: str = "backend"):
        self._b = backend
        self._name = name
        self.SUPPORTED_STYLES = getattr(backend, "SUPPORTED_STYLES", 0x3F)

    def __repr__(self):
        return f"<debug-verified {self._name}: {self._b!r}>"

    # -- encode -----------------------------------------------------------
    def encode_cblks(self, coeffs, heights, widths, orients, styles=None,
                     **kw):
        got = self._b.encode_cblks(coeffs, heights, widths, orients,
                                   styles=styles, **kw)
        from . import ebcot_np

        want = ebcot_np.encode_cblks(
            np.asarray(coeffs), np.asarray(heights), np.asarray(widths),
            np.asarray(orients), styles=styles)
        bad = []
        n = len(want.lengths)
        for i in range(n):
            lw, lg = int(want.lengths[i]), int(got.lengths[i])
            bw = bytes(want.data[i, :lw])
            bg = bytes(got.data[i, :lg])
            if lw != lg or bw != bg or int(want.numbps[i]) != int(got.numbps[i]):
                bad.append(i)
        if not bad:
            return got
        # divergence: replay with CxD capture for the offending blocks
        idx = np.asarray(bad)
        _, streams = capture_cxd(
            np.asarray(coeffs)[idx], np.asarray(heights)[idx],
            np.asarray(widths)[idx], np.asarray(orients)[idx],
            styles=None if styles is None else np.asarray(styles)[idx])
        lines = []
        for k, i in enumerate(bad[:8]):
            lw, lg = int(want.lengths[i]), int(got.lengths[i])
            bw = bytes(want.data[i, :lw])
            bg = bytes(got.data[i, :lg])
            first = next(
                (j for j in range(min(lw, lg)) if bw[j] != bg[j]),
                min(lw, lg))
            cxd = streams[k]
            tail = ", ".join(f"{v >> 1}:{v & 1}" for v in cxd[-CXD_CACHE:])
            lines.append(
                f"block {i}: len {lw} vs {lg}, first diff byte {first}, "
                f"{len(cxd)} MQ decisions, cxd tail [{tail}]")
        msg = (f"T1 backend '{self._name}' diverged from the reference "
               f"coder on {len(bad)}/{n} blocks:\n  " + "\n  ".join(lines))
        log.error("%s", msg)
        raise BackendMismatch(msg)

    # -- decode -----------------------------------------------------------
    def decode_cblks(self, data, lengths, numbps, npasses, heights, widths,
                     orients, block_h, block_w, styles=None,
                     seg_lengths=None, **kw):
        got = self._b.decode_cblks(data, lengths, numbps, npasses, heights,
                                   widths, orients, block_h, block_w,
                                   styles=styles, seg_lengths=seg_lengths,
                                   **kw)
        from . import ebcot_np

        want = ebcot_np.decode_cblks(
            data, lengths, numbps, npasses, heights, widths, orients,
            block_h, block_w, styles=styles, seg_lengths=seg_lengths)
        # backends return (coeffs [N,H,W], planes_decoded [N])
        ga, gp = (np.asarray(got[0]), np.asarray(got[1]))
        wa, wp = (np.asarray(want[0]), np.asarray(want[1]))
        if (ga.shape != wa.shape or not np.array_equal(ga, wa)
                or not np.array_equal(gp, wp)):
            if ga.shape == wa.shape:
                bad = [int(i) for i in np.nonzero(
                    (ga != wa).reshape(ga.shape[0], -1).any(1))[0]]
            else:
                bad = ["shape " + str(ga.shape) + " vs " + str(wa.shape)]
            msg = (f"T1 backend '{self._name}' decode diverged on blocks "
                   f"{bad[:16]}{'...' if len(bad) > 16 else ''}")
            log.error("%s", msg)
            raise BackendMismatch(msg)
        return got
