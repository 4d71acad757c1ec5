"""Pallas (TPU) EBCOT Tier-1 encoder: VMEM-resident lockstep scan.

The round-3 device T1 design (docs/DEVICE.md "Engineering conclusions" #2):
the per-coefficient context-modeling scan — the hot part of Tier-1 — runs as
a Pallas kernel with the significance/visited/refined flag plane resident in
VMEM and all per-position decisions vectorized across a 128-codeblock lane
batch. The kernel emits fixed-layout *symbol records* (valid|raw|bit|ctx, one
byte each, at statically known slot positions), and the inherently serial MQ
byte packing runs on the host, reusing the bit-exact lane-parallel MQEncoder
from ebcot_np. This sidesteps the variable-rate per-lane byte-store problem
that has no efficient TPU vector form (each lane's stream grows at a
data-dependent rate) while keeping the expensive part — the neighborhood
scan over every (plane, pass, position) — on-chip.

Why this split is sound: the *encoder's* symbol sequence is fully determined
by the coefficient data (MQ state never feeds back into the scan), so
symbols + contexts reproduce the byte stream exactly. The decoder has a true
feedback loop through the MQ registers and stays on the lockstep jax /
native host coders.

Reference mapping: t1/t1_part1/T1.cpp compress_cblk (pass loops),
mqc_enc.cpp (host packer side). Styles: VSC/SEGSYM/BYPASS shape the symbol
stream (kernel); TERMALL/RESET/PTERM only affect segment termination and
context resets at pass boundaries (host packer) — so all Part-1 codeblock
styles are supported and bit-identical to the numpy/native backends.
"""

from __future__ import annotations

import os

import numpy as np

from .ebcot_np import (
    T1EncodeResult,
    _dd_ref,
    _dd_sig,
    _lane_numbps,
    _local_pass_index,
    _pass_is_raw,
    _term_after,
)
from .mq_np import CTX_MR0, CTX_RL, CTX_UNI, MQEncoder

SUPPORTED_STYLES = 0x3F

# symbol record bit layout (must match kernel + packer)
_VALID = 0x80
_RAW = 0x40
_BIT = 0x20
_CTXM = 0x1F


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _slot_counts(ns: int, w: int) -> tuple[int, int, int, int]:
    s_spp = ns * w * 8      # (s, x, k) x (zc, sign)
    s_mrp = ns * w * 4      # (s, x, k)
    s_cup = ns * w * 11 + 4  # (s, x) x (rl, uni1, uni0, 4x(zc, sign)) + segsym
    s_pad = _round_up(max(s_spp, s_cup), 8)
    return s_spp, s_mrp, s_cup, s_pad


# ================================================================ the kernel
_KERNELS: dict = {}


def _build_kernel_wide(Hp: int, W: int, NL: int, SUB: int, PMAXC: int,
                       interpret: bool):
    """Multi-block-per-sublane layout: SUB codeblocks ride the sublane axis.

    The original kernel stores one position per VMEM row, so every vector
    op is a [1, 128] row using 1/8 of the VPU sublanes. Here position r of
    sub-block g lives at VMEM row r*SUB + g: every load/store is a full
    (SUB, 128) tile and every context computation runs on SUB*128 blocks at
    once. Three further changes cut the op count per position:

    - signs are folded into the flag plane (bit 3) at plane 0, so the sign
      context needs no coefficient neighbor loads at all;
    - the 6 flag row-triples a column touches are loaded once per column
      and patched in registers as positions update them (the original
      reloaded 6 triples per *position*);
    - all row/store addresses are SUB-aligned multiples, so dynamic-offset
      tile realignment disappears.

    The symbol output is gridded per (pass, stripe) — grid (PMAXC, 3*NS) —
    which bounds the out-block VMEM slice to one stripe's slots and keeps
    every in-kernel address affine in the single column fori variable (the
    Mosaic constraint documented in cup_col above). Replaces the parallel
    axis of the reference's per-thread T1 instances
    (t1/T1CompressScheduler.cpp:91-145)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    NS = Hp // 4
    Wp = W + 2
    R = (Hp + 2) * Wp
    # per-stripe slot spans (stripe-local slot layout)
    S_SPP1 = W * 8
    S_MRP1 = W * 4
    S_CUP1 = W * 11
    S_STRIPE = _round_up(S_CUP1 + 4, 8)  # CUP worst + segsym tail

    def zc_ctx(fu, fm, fd, dnc, orient):
        """ZC context + neighbor count; f*: [3, SUB, NL] flag row triples
        (index i = column x-1+i), dnc: VSC cut mask for the row below."""
        s = lambda t, i: t[i] & 1
        blw = lambda i: jnp.where(dnc, 0, s(fd, i))
        h = s(fm, 0) + s(fm, 2)
        v = s(fu, 1) + blw(1)
        d = s(fu, 0) + s(fu, 2) + blw(0) + blw(2)
        hn = jnp.where(orient == 1, v, h)
        vn = jnp.where(orient == 1, h, v)
        nrm = jnp.where(
            hn == 2,
            8,
            jnp.where(
                hn == 1,
                jnp.where(vn >= 1, 7, jnp.where(d >= 1, 6, 5)),
                jnp.where(
                    vn == 2,
                    4,
                    jnp.where(
                        vn == 1, 3,
                        jnp.where(d >= 2, 2, jnp.where(d == 1, 1, 0))
                    ),
                ),
            ),
        )
        a = h + v
        hh = jnp.where(
            d >= 3,
            8,
            jnp.where(
                d == 2,
                jnp.where(a >= 1, 7, 6),
                jnp.where(
                    d == 1,
                    jnp.where(a >= 2, 5, jnp.where(a == 1, 4, 3)),
                    jnp.where(a >= 2, 2, jnp.where(a == 1, 1, 0)),
                ),
            ),
        )
        return jnp.where(orient == 3, hh, nrm), h + v + d

    def sc_ctx(fu, fm, fd, dnc):
        """Sign context + xor from the flag plane alone (sig bit 0, sign
        bit 3) — no coefficient loads."""
        con = lambda t, i: (t[i] & 1) * (1 - 2 * ((t[i] >> 3) & 1))
        below = jnp.where(dnc, 0, con(fd, 1))
        hb = jnp.clip(con(fm, 0) + con(fm, 2), -1, 1)
        vb = jnp.clip(con(fu, 1) + below, -1, 1)
        ctx = jnp.where(hb == 0, 9 + jnp.abs(vb), 12 + hb * vb)
        xr = jnp.where(hb == 0, (vb < 0).astype(jnp.int32),
                       (hb < 0).astype(jnp.int32))
        return ctx, xr

    def kernel(coef_ref, lane_ref, sym_ref, flags_ref):
        p = pl.program_id(0)
        q = pl.program_id(1)
        plane = (PMAXC - 1) - p

        @pl.when((p == 0) & (q == 0))
        def _():
            # flag bit 3 = static sign plane; bits 0..2 start clear
            flags_ref[:] = jnp.where(coef_ref[:] < 0, jnp.int32(8),
                                     jnp.int32(0))

        attr = lambda a: lane_ref[a * SUB:(a + 1) * SUB, :]
        nbps = attr(0)
        hgt = attr(1)
        wid = attr(2)
        orient = attr(3)
        vsc = attr(4) != 0
        segsym = attr(5) != 0
        bypass = attr(6) != 0

        spp_m = (nbps - 1) > plane
        cup_m = (nbps - 1) >= plane
        rel = nbps - 1 - plane

        def lpi(kind):
            return jnp.where(rel <= 0, 0, (rel - 1) * 3 + 1 + kind)

        raw_spp = bypass & (lpi(0) >= 10)
        raw_mrp = bypass & (lpi(1) >= 10)

        def rec(valid, raw, bit, ctx):
            return (
                (valid.astype(jnp.int32) << 7)
                | ((raw & valid).astype(jnp.int32) << 6)
                | ((bit.astype(jnp.int32) & 1) << 5)
                | ctx.astype(jnp.int32)
            )

        def put(slot, v):
            sym_ref[0, 0, pl.ds(slot * SUB, SUB), :] = v

        def load_col(y0, x):
            """Flag row-triples (rows y0-1..y0+4) + center coef rows of one
            stripe column; each triple is a PYTHON LIST of three (SUB, NL)
            column slices so the in-register patch in store_flags is a
            plain list assignment — a traced ``.at[1].set`` on a stacked
            (3, SUB, NL) value lowers to `scatter`, which Mosaic has no
            TPU lowering for (verified on v5e)."""
            F = []
            for j in range(6):
                t = flags_ref[pl.ds(((y0 + j) * Wp + x) * SUB, 3 * SUB), :]
                F.append([t[0:SUB], t[SUB:2 * SUB], t[2 * SUB:3 * SUB]])
            C = [
                coef_ref[pl.ds(((y0 + k + 1) * Wp + (x + 1)) * SUB, SUB), :]
                for k in range(4)
            ]
            return F, C

        def store_flags(y0, k, x, newf, F):
            flags_ref[pl.ds(((y0 + k + 1) * Wp + (x + 1)) * SUB, SUB), :] = \
                newf
            F[k + 1][1] = newf

        def spp_stripe(s):
            y0 = 4 * s

            def colb(x, _):
                F, C = load_col(y0, x)
                for k in range(4):
                    fu, fm, fd = F[k], F[k + 1], F[k + 2]
                    dnc = vsc & (k == 3)
                    ctx, ncnt = zc_ctx(fu, fm, fd, dnc, orient)
                    selff = fm[1]
                    mag = jnp.abs(C[k])
                    sgn = (C[k] < 0).astype(jnp.int32)
                    y = y0 + k
                    inb = (y < hgt) & (x < wid) & spp_m
                    code = inb & ((selff & 1) == 0) & (ncnt > 0)
                    bit = (mag >> plane) & 1
                    slot0 = x * 8 + k * 2
                    put(slot0, rec(code, raw_spp, bit, ctx))
                    became = code & (bit == 1)
                    scc, xr = sc_ctx(fu, fm, fd, dnc)
                    sbit = jnp.where(raw_spp, sgn, sgn ^ xr)
                    put(slot0 + 1, rec(became, raw_spp, sbit, scc))
                    newf = (selff | became.astype(jnp.int32)
                            | (code.astype(jnp.int32) << 1))
                    store_flags(y0, k, x, newf, F)
                return 0

            jax.lax.fori_loop(0, W, colb, 0)

        def mrp_stripe(s):
            y0 = 4 * s

            def colb(x, _):
                F, C = load_col(y0, x)
                for k in range(4):
                    fu, fm, fd = F[k], F[k + 1], F[k + 2]
                    dnc = vsc & (k == 3)
                    _, ncnt = zc_ctx(fu, fm, fd, dnc, orient)
                    selff = fm[1]
                    sig_v = (selff & 1) != 0
                    vis = (selff & 2) != 0
                    refn = (selff & 4) != 0
                    y = y0 + k
                    inb = (y < hgt) & (x < wid) & spp_m
                    code = inb & sig_v & ~vis
                    ctx = jnp.where(
                        refn, CTX_MR0 + 2,
                        jnp.where(ncnt > 0, CTX_MR0 + 1, CTX_MR0))
                    bit = (jnp.abs(C[k]) >> plane) & 1
                    put(x * 4 + k, rec(code, raw_mrp, bit, ctx))
                    store_flags(y0, k, x,
                                selff | (code.astype(jnp.int32) << 2), F)
                return 0

            jax.lax.fori_loop(0, W, colb, 0)

        def cup_stripe(s):
            y0 = 4 * s

            def colb(x, _):
                F, C = load_col(y0, x)
                base = x * 11
                full_stripe = (y0 + 4) <= hgt
                col_ok = full_stripe & (x < wid) & cup_m

                rl = col_ok
                for k in range(4):
                    dnc = vsc & (k == 3)
                    _, ncnt = zc_ctx(F[k], F[k + 1], F[k + 2], dnc, orient)
                    selff = F[k + 1][1]
                    rl = rl & ((selff & 3) == 0) & (ncnt == 0)

                fk = jnp.full((SUB, NL), 4, dtype=jnp.int32)
                for k in range(3, -1, -1):
                    bit = (jnp.abs(C[k]) >> plane) & 1
                    fk = jnp.where(rl & (bit == 1), k, fk)
                rl_bit = (rl & (fk < 4)).astype(jnp.int32)
                zf = jnp.zeros_like(rl)
                put(base, rec(rl, zf, rl_bit,
                              jnp.full((SUB, NL), CTX_RL, jnp.int32)))
                sigcol = rl & (rl_bit == 1)
                uni = jnp.full((SUB, NL), CTX_UNI, jnp.int32)
                put(base + 1, rec(sigcol, zf, (fk >> 1) & 1, uni))
                put(base + 2, rec(sigcol, zf, fk & 1, uni))
                skip_rl0 = rl & (rl_bit == 0)

                for k in range(4):
                    fu, fm, fd = F[k], F[k + 1], F[k + 2]
                    dnc = vsc & (k == 3)
                    selff = fm[1]
                    y = y0 + k
                    inb = (y < hgt) & (x < wid) & cup_m
                    bse = inb & ((selff & 3) == 0) & ~skip_rl0
                    pre_run = sigcol & (k < fk)
                    implied = sigcol & (k == fk)
                    zc_code = bse & ~pre_run & ~implied
                    ctx, _n = zc_ctx(fu, fm, fd, dnc, orient)
                    mag = jnp.abs(C[k])
                    sgn = (C[k] < 0).astype(jnp.int32)
                    bit = (mag >> plane) & 1
                    put(base + 3 + 2 * k, rec(zc_code, zf, bit, ctx))
                    became = (zc_code & (bit == 1)) | implied
                    scc, xr = sc_ctx(fu, fm, fd, dnc)
                    put(base + 4 + 2 * k, rec(became, zf, sgn ^ xr, scc))
                    store_flags(y0, k, x,
                                selff | became.astype(jnp.int32), F)
                return 0

            jax.lax.fori_loop(0, W, colb, 0)
            if s == NS - 1:
                seg = segsym & cup_m
                uni = jnp.full((SUB, NL), CTX_UNI, jnp.int32)
                z = jnp.zeros_like(seg)
                for j, b in enumerate((1, 0, 1, 0)):
                    put(S_CUP1 + j,
                        rec(seg, z, jnp.full((SUB, NL), b, jnp.int32), uni))
            # clear 'visited' on this stripe's rows for the next plane
            a = (4 * s + 1) * Wp * SUB
            nr = 4 * Wp * SUB
            flags_ref[pl.ds(a, nr), :] = (
                flags_ref[pl.ds(a, nr), :] & ~jnp.int32(2))

        # q enumerates (pass, stripe); stripe bodies are python-specialized
        # so every VMEM address stays affine in the column fori variable
        for s in range(NS):
            @pl.when(q == s)
            def _(s=s):
                spp_stripe(s)

            @pl.when(q == NS + s)
            def _(s=s):
                mrp_stripe(s)

            @pl.when(q == 2 * NS + s)
            def _(s=s):
                cup_stripe(s)

    call = pl.pallas_call(
        kernel,
        grid=(PMAXC, 3 * NS),
        in_specs=[
            pl.BlockSpec((R * SUB, NL), lambda p, q: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8 * SUB, NL), lambda p, q: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, S_STRIPE * SUB, NL), lambda p, q: (p, q, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((PMAXC, 3 * NS, S_STRIPE * SUB, NL),
                                       jnp.int32),
        scratch_shapes=[pltpu.VMEM((R * SUB, NL), jnp.int32)],
        interpret=interpret,
    )

    import jax as _jax

    def run(flat, lane_tab):
        out = call(flat, lane_tab)
        return (out & 0xFF).astype(jnp.uint8)  # 4x smaller fetch

    return _jax.jit(run)


# The "narrow" one-block-per-lane kernel layout that used to live here was
# quarantined in round 5: it stopped lowering on the current Mosaic
# toolchain ("cannot statically prove that index in dimension 0 is a
# multiple of 8"; PALLAS_HW_r04.json) and the wide multi-block-per-sublane
# layout with adaptive SUB is strictly faster and is the only supported
# Pallas path. History: git log -S _build_kernel_narrow.


# ============================================================== host packer
def _pack_symbols(
    sym: np.ndarray,  # [PMAXC, 3, S_PAD, n] uint8 symbol records
    mag: np.ndarray,  # [n, h, w] magnitudes (unpadded)
    numbps: np.ndarray,
    heights: np.ndarray,
    widths: np.ndarray,
    styles: np.ndarray | None,
    Hp: int,
) -> T1EncodeResult:
    """Serial MQ/raw byte packing of the kernel's symbol streams.

    Bit-identical to ebcot_np.encode_cblks by construction: the MQ coder,
    pass-rate bounds, termination and distortion formulas are the same
    lane-parallel machinery, driven by the recorded symbols instead of a
    host rescan."""
    n, h, w = mag.shape
    NS = Hp // 4
    S_SPP, S_MRP, S_CUP, _ = _slot_counts(NS, w)
    PMAXC = sym.shape[0]

    pmax = int(numbps.max(initial=0))
    npasses = np.maximum(numbps * 3 - 2, 0)
    max_passes = int(npasses.max(initial=0))
    max_bytes = max(64, (pmax * h * w) // 4 + 128)
    mq = MQEncoder(n, max_bytes)
    lanes_idx = np.arange(n)

    pass_rates = np.zeros((n, max(max_passes, 1)), dtype=np.int64)
    pass_dist = np.zeros((n, max(max_passes, 1)), dtype=np.float64)
    sty = np.zeros(n, dtype=np.int64) if styles is None else np.asarray(styles)
    termall_m = (sty & 0x04) != 0
    bypass_m = (sty & 0x01) != 0
    reset_m = (sty & 0x02) != 0
    last_term = np.zeros(n, dtype=bool)

    # magnitudes in (s, x, k) slot order for vectorized distortion sums
    magp = np.zeros((n, Hp, w), dtype=np.int64)
    magp[:, :h, :] = mag
    mag_sxk = magp.reshape(n, NS, 4, w).transpose(0, 1, 3, 2).reshape(n, -1)

    def feed(stream):
        """stream: [S, n] — drive the lockstep MQ/raw coders slot by slot."""
        for srow in stream:
            valid = (srow & _VALID) != 0
            if not valid.any():
                continue
            raw = (srow & _RAW) != 0
            bit = ((srow >> 5) & 1).astype(np.uint8)
            ctx = (srow & _CTXM).astype(np.int64)
            mqm = valid & ~raw
            if mqm.any():
                mq.encode(bit, ctx, mqm)
            rm = valid & raw
            if rm.any():
                mq.raw_bit(bit, rm)

    def end_pass(plane, kind, lane_mask, dd):
        if not lane_mask.any():
            return
        lpi = _local_pass_index(plane, kind, numbps)
        raw_m = _pass_is_raw(bypass_m, lpi, kind) & lane_mask
        term_m = _term_after(termall_m, bypass_m, lpi, kind) & lane_mask
        r = mq.pos + (27 - mq.ct + 7) // 8
        if hasattr(mq, "raw_used"):
            r = np.where(raw_m, mq.raw_safe_len(), r)
        t_mq = term_m & ~raw_m
        t_raw = term_m & raw_m
        if t_mq.any():
            r = np.where(t_mq, mq.terminate_restart(t_mq), r)
        if t_raw.any():
            r = np.where(t_raw, mq.raw_terminate_restart_mq(t_raw), r)
        pass_rates[lane_mask, lpi[lane_mask]] = r[lane_mask]
        pass_dist[lane_mask, lpi[lane_mask]] = dd[lane_mask]
        last_term[lane_mask] = term_m[lane_mask]
        mq.reset_ctx(reset_m & lane_mask)
        nxt_raw = _pass_is_raw(bypass_m, lpi + 1, (kind + 1) % 3) & term_m
        if nxt_raw.any():
            mq.raw_start(nxt_raw)

    for plane in range(pmax - 1, -1, -1):
        pidx = PMAXC - 1 - plane
        spp_lanes = numbps - 1 > plane
        cup_lanes = numbps - 1 >= plane
        if spp_lanes.any():
            stream = sym[pidx, 0, :S_SPP]
            feed(stream)
            became = (stream.reshape(-1, 2, n)[:, 1, :] & _VALID) != 0
            dd = np.where(became.T, _dd_sig(mag_sxk, plane), 0.0).sum(axis=1)
            end_pass(plane, 0, spp_lanes, dd)

            stream = sym[pidx, 1, :S_MRP]
            feed(stream)
            coded = (stream & _VALID) != 0
            dd = np.where(coded.T, _dd_ref(mag_sxk, plane), 0.0).sum(axis=1)
            end_pass(plane, 1, spp_lanes, dd)
        if cup_lanes.any():
            stream = sym[pidx, 2, :S_CUP]
            feed(stream)
            became = (
                stream[: NS * w * 11].reshape(-1, 11, n)[:, 4::2, :] & _VALID
            ) != 0
            dd = np.where(
                became.reshape(-1, n).T, _dd_sig(mag_sxk, plane), 0.0
            ).sum(axis=1)
            end_pass(plane, 2, cup_lanes, dd)

    final_lpi = np.maximum(npasses - 1, 0)
    in_raw_tail = _pass_is_raw(
        bypass_m, final_lpi, np.where(final_lpi == 0, 2, (final_lpi - 1) % 3)
    ) & ~last_term
    lengths = np.zeros(n, dtype=np.int64)
    if last_term.any():
        lengths = np.where(last_term, pass_rates[lanes_idx, final_lpi], lengths)
    if in_raw_tail.any():
        lengths = np.where(
            in_raw_tail, mq.raw_terminate_restart_mq(in_raw_tail), lengths
        )
    rest = ~last_term & ~in_raw_tail
    if rest.any():
        mq.flush(rest)
        lengths = np.where(rest, mq.lengths(), lengths)
    lengths = np.where(npasses > 0, lengths, 0)
    if max_passes:
        pass_rates[lanes_idx, final_lpi] = lengths
        np.minimum(pass_rates, lengths[:, None], out=pass_rates)
    return T1EncodeResult(
        data=mq.buf[:, 1:],
        raw_data=(mq.buf, 1),
        lengths=lengths,
        numbps=numbps,
        npasses=npasses,
        pass_rates=pass_rates,
        pass_dist=pass_dist,
    )


def _pack_symbols_nat(
    sym_lane_major: np.ndarray,  # [n, PMAXC, 3, S_PAD] uint8, C-contiguous
    mag: np.ndarray,
    numbps: np.ndarray,
    styles: np.ndarray | None,
    Hp: int,
) -> T1EncodeResult | None:
    """Native (OpenMP) symbol packer; returns None if the lib is absent."""
    from . import native

    lib = native.get_lib()
    if lib is None:
        return None
    n, h, w = mag.shape
    NS = Hp // 4
    _, pmaxc, _, s_pad = sym_lane_major.shape
    pmax = int(numbps.max(initial=0))
    npasses = np.maximum(numbps * 3 - 2, 0)
    max_passes = int(npasses.max(initial=0))
    max_bytes = max(64, (pmax * h * w) // 4 + 128)

    magp = np.zeros((n, Hp, w), dtype=np.int64)
    magp[:, :h, :] = mag
    mag_sxk = np.ascontiguousarray(
        magp.reshape(n, NS, 4, w).transpose(0, 1, 3, 2).reshape(n, -1)
    )
    sty = (
        np.zeros(n, dtype=np.int32)
        if styles is None
        else np.asarray(styles, dtype=np.int32)
    )
    out = np.zeros((n, max_bytes + 2), dtype=np.uint8)
    lengths = np.zeros(n, dtype=np.int64)
    pass_rates = np.zeros((n, max(max_passes, 1)), dtype=np.int64)
    pass_dist = np.zeros((n, max(max_passes, 1)), dtype=np.float64)
    rc = lib.t1_pack_symbols(
        np.ascontiguousarray(sym_lane_major),
        mag_sxk,
        np.asarray(numbps, dtype=np.int32),
        sty,
        n, pmaxc, pmax, s_pad, NS, w,
        out, max_bytes,
        lengths, pass_rates, pass_dist,
        max(max_passes, 1), native._nthreads(0),
    )
    if rc != 0:
        raise RuntimeError("t1_pack_symbols: output buffer overflow")
    return T1EncodeResult(
        data=out[:, 1:],
        raw_data=(out, 1),
        lengths=lengths,
        numbps=numbps,
        npasses=npasses,
        pass_rates=pass_rates,
        pass_dist=pass_dist,
    )


# ====================================================== wide-layout encode
def _encode_wide(coeffs, heights, widths, orients, numbps, styles,
                 interpret: bool) -> T1EncodeResult:
    """encode_cblks through the multi-block-per-sublane kernel."""
    import jax.numpy as jnp

    n, h, w = coeffs.shape
    mag = np.abs(coeffs)
    pmax = int(numbps.max(initial=0))
    Hp = _round_up(h, 4)
    PMAXC = _round_up(pmax, 4)
    NL = 128 if not interpret else 8
    sub_env = os.environ.get("GROK_TPU_PALLAS_SUB")
    if sub_env:
        SUB = int(sub_env)
    else:
        # largest sublane-group count whose VMEM footprint fits: coef block
        # + flags scratch (both whole-image, (Hp+2)*(w+2) rows each) + one
        # stripe's out block, all int32 x NL lanes. 13 MiB leaves headroom
        # under the 16 MiB scoped limit (64x64 @ SUB=8 is 38 MiB -> OOM on
        # v5e, verified; SUB=2 fits).
        _R = (Hp + 2) * (w + 2)
        _S = _round_up(w * 11 + 4, 8)
        for SUB in (8, 4, 2, 1):
            if (2 * _R + 8 + _S) * SUB * NL * 4 <= 13 << 20:
                break
    NP_ = _round_up(n, SUB * NL)
    SUB_T = NP_ // NL  # total sublane groups across launches
    Wp = w + 2
    R = (Hp + 2) * Wp
    NS = Hp // 4
    S_SPP1, S_MRP1, S_CUP1 = w * 8, w * 4, w * 11
    S_SPP, S_MRP, S_CUP, S_PAD = _slot_counts(NS, w)

    sty = np.zeros(n, dtype=np.int64) if styles is None else np.asarray(styles)
    fn = _get_kernel_wide(Hp, w, NL, SUB, PMAXC, interpret)

    sym_all = np.zeros((PMAXC, 3, S_PAD, NP_), dtype=np.uint8)
    for g0 in range(0, NP_, SUB * NL):
        i0, i1 = g0, min(g0 + SUB * NL, n)
        nn = max(i1 - i0, 0)
        flat = np.zeros((Hp + 2, Wp, SUB, NL), dtype=np.int32)
        lane_tab = np.zeros((8, SUB, NL), dtype=np.int32)
        if nn > 0:
            cs = np.zeros((SUB * NL, h, w), dtype=np.int32)
            cs[:nn] = coeffs[i0:i1]
            flat[1:h + 1, 1:w + 1] = cs.reshape(SUB, NL, h, w).transpose(
                2, 3, 0, 1)
            for a, src in enumerate((numbps[i0:i1], heights[i0:i1],
                                     widths[i0:i1], orients[i0:i1],
                                     (sty[i0:i1] & 0x08) != 0,
                                     (sty[i0:i1] & 0x20) != 0,
                                     (sty[i0:i1] & 0x01) != 0)):
                buf = np.zeros(SUB * NL, dtype=np.int32)
                buf[:nn] = src
                lane_tab[a] = buf.reshape(SUB, NL)
        sym = np.asarray(fn(jnp.asarray(flat.reshape(R * SUB, NL)),
                            jnp.asarray(lane_tab.reshape(8 * SUB, NL))))
        # [PMAXC, 3*NS, S_STRIPE*SUB, NL] -> global slot-major per pass
        def spans(pass_i, s1):
            part = sym[:, pass_i * NS:(pass_i + 1) * NS, :s1 * SUB]
            return part.reshape(PMAXC, NS * s1, SUB * NL)

        sym_all[:, 0, :S_SPP, g0:g0 + SUB * NL] = spans(0, S_SPP1)
        sym_all[:, 1, :S_MRP, g0:g0 + SUB * NL] = spans(1, S_MRP1)
        sym_all[:, 2, :NS * S_CUP1, g0:g0 + SUB * NL] = spans(2, S_CUP1)
        # segsym tail records live in the last CUP stripe's block
        tail = sym[:, 3 * NS - 1, S_CUP1 * SUB:(S_CUP1 + 4) * SUB]
        sym_all[:, 2, NS * S_CUP1:NS * S_CUP1 + 4, g0:g0 + SUB * NL] = \
            tail.reshape(PMAXC, 4, SUB * NL)

    sym_u8 = sym_all[:, :, :, :n]
    if os.environ.get("GROK_TPU_PALLAS_PACKER") != "numpy":
        res = _pack_symbols_nat(
            np.ascontiguousarray(sym_u8.transpose(3, 0, 1, 2)),
            mag, numbps, styles, Hp,
        )
        if res is not None:
            return res
    return _pack_symbols(sym_u8, mag, numbps, heights, widths, styles, Hp)


def _get_kernel_wide(Hp, W, NL, SUB, PMAXC, interpret):
    key = ("wide", Hp, W, NL, SUB, PMAXC, interpret)
    fn = _KERNELS.get(key)
    if fn is None:
        fn = _KERNELS[key] = _build_kernel_wide(Hp, W, NL, SUB, PMAXC,
                                                interpret)
    return fn


# ============================================================== public API
def _use_interpret() -> bool:
    v = os.environ.get("GROK_TPU_PALLAS_INTERPRET")
    if v is not None:
        return v not in ("0", "")
    try:
        import jax

        return jax.default_backend() not in ("tpu",)
    except Exception:
        return True


def available() -> bool:
    try:
        import jax  # noqa: F401

        return True
    except Exception:
        return False


def encode_cblks(
    coeffs: np.ndarray,
    heights: np.ndarray,
    widths: np.ndarray,
    orients: np.ndarray,
    max_bitplanes: int | None = None,
    styles: np.ndarray | None = None,
    want_dist: bool = True,  # accepted for API parity; always computed here
) -> T1EncodeResult:
    coeffs = np.asarray(coeffs, dtype=np.int64)
    n, h, w = coeffs.shape
    mag = np.abs(coeffs)
    numbps = _lane_numbps(mag, heights, widths)
    pmax = int(numbps.max(initial=0))
    if pmax == 0 or n == 0:
        from . import ebcot_np

        return ebcot_np.encode_cblks(
            coeffs, heights, widths, orients, max_bitplanes, styles
        )

    import jax.numpy as jnp

    interpret = _use_interpret()
    return _encode_wide(coeffs, heights, widths, orients, numbps,
                        styles, interpret)


def decode_cblks(*args, **kwargs):
    """Decode delegates to the host coders: the MQ decoder's feedback loop
    (each decoded bit steers the scan) is inherently serial per block and
    gains nothing from the symbol-stream split (docs/DEVICE.md)."""
    from . import native

    if native.available():
        return native.decode_cblks(*args, **kwargs)
    from . import ebcot_np

    return ebcot_np.decode_cblks(*args, **kwargs)
