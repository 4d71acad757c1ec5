"""Device (TPU) lockstep EBCOT Tier-1 coder — jax.lax formulation.

The same lane-parallel algorithm as ebcot_np.py compiled onto the chip:
every MQ register, context table and flag plane lives in an [.., N] array
with the codeblock batch as the minor (vector) dimension, and the standard's
sequential scan becomes nested lax.fori_loops whose body advances all N
blocks one position per step. Renormalization is branch-free (CLZ + three
unrolled byte-boundary blocks), context-state updates are dense one-hot
selects (19 contexts), and flag updates are single-row dynamic slices.

This is the "MQ coder as batched per-codeblock TPU state machine" the
design brief names; bit-exact against the numpy/C++ coders.
"""

from __future__ import annotations

import functools

import numpy as np

from .ebcot_np import T1EncodeResult, _ZC_LUT, _SC_CTX, _SC_XOR
from .mq_np import NMPS, NLPS, QE, SWITCH, CTX_MR0, CTX_RL, CTX_UNI


def _j():
    import jax
    import jax.numpy as jnp

    return jax, jnp


# ---------------------------------------------------------------- MQ (enc)
def _mq_tables(jnp):
    return (
        jnp.asarray(QE, dtype=jnp.int32),
        jnp.asarray(NMPS, dtype=jnp.int32),
        jnp.asarray(NLPS, dtype=jnp.int32),
        jnp.asarray(SWITCH, dtype=jnp.int32),
    )


def _bitlen32(jax, jnp, v):
    """bit length of positive int32 values."""
    return 32 - jax.lax.clz(v.astype(jnp.int32))


def _enc_byteout(jax, jnp, st, do):
    """Branch-free lockstep BYTEOUT. st: dict of MQ state arrays."""
    n = st["a"].shape[0]
    lanes = jnp.arange(n)
    b = st["buf"][st["pos"], lanes].astype(jnp.int32)
    c = st["c"]

    is_ff = b == 0xFF
    carry = (c & 0x8000000) != 0
    prop = do & (~is_ff) & carry
    b2 = jnp.where(prop, (b + 1) & 0xFF, b)
    buf = st["buf"].at[st["pos"], lanes].set(
        jnp.where(do, b2, b).astype(jnp.uint8), mode="drop"
    )
    c = jnp.where(prop & (b2 == 0xFF), c & 0x7FFFFFF, c)
    is_ff = b2 == 0xFF

    new_byte = jnp.where(is_ff, (c >> 20) & 0xFF, (c >> 19) & 0xFF)
    new_c = jnp.where(is_ff, c & 0xFFFFF, c & 0x7FFFF)
    new_ct = jnp.where(is_ff, 7, 8)

    wpos = jnp.where(do, st["pos"] + 1, st["pos"])
    prev = buf[wpos, lanes]
    buf = buf.at[wpos, lanes].set(
        jnp.where(do, new_byte.astype(jnp.uint8), prev), mode="drop"
    )
    st = dict(st)
    st["buf"] = buf
    st["pos"] = wpos
    st["c"] = jnp.where(do, new_c, st["c"])
    st["ct"] = jnp.where(do, new_ct, st["ct"])
    return st


def _enc_renorm(jax, jnp, st, need):
    """Branch-free renorm: shift A fully, move C across <=3 byte boundaries."""
    a = st["a"]
    k = jnp.where(need, 16 - _bitlen32(jax, jnp, jnp.maximum(a, 1)), 0)
    st = dict(st)
    st["a"] = jnp.where(need, a << k, a)
    for _ in range(3):
        take = jnp.minimum(k, st["ct"])
        st["c"] = jnp.where(need, (st["c"] << take) & 0xFFFFFFF, st["c"])
        st["ct"] = st["ct"] - jnp.where(need, take, 0)
        k = k - take
        st = _enc_byteout(jax, jnp, st, need & (st["ct"] == 0) & True)
    return st


def _enc_encode(jax, jnp, st, bit, ctx, mask, tables):
    """One lockstep ENCODE (T.88 CODEMPS/CODELPS)."""
    qe_t, nmps_t, nlps_t, sw_t = tables
    n = st["a"].shape[0]
    onehot = (jnp.arange(19)[None, :] == ctx[:, None]) & mask[:, None]

    state = jnp.take_along_axis(st["cx_state"], ctx[:, None], axis=1)[:, 0]
    mps = jnp.take_along_axis(st["cx_mps"], ctx[:, None], axis=1)[:, 0]
    qe = jnp.take(qe_t, state)
    is_mps = (bit == mps) & mask
    is_lps = (bit != mps) & mask

    a = st["a"]
    a_sub = a - qe
    no_renorm = is_mps & ((a_sub & 0x8000) != 0)
    renorm_mps = is_mps & ((a_sub & 0x8000) == 0)
    cond_ex = renorm_mps & (a_sub < qe)
    cond_ex_l = is_lps & (a_sub < qe)

    st = dict(st)
    st["c"] = jnp.where(
        no_renorm | (renorm_mps & ~cond_ex) | cond_ex_l, st["c"] + qe, st["c"]
    )
    new_state = jnp.where(
        renorm_mps, jnp.take(nmps_t, state),
        jnp.where(is_lps, jnp.take(nlps_t, state), state),
    )
    st["cx_state"] = jnp.where(
        onehot, new_state[:, None].astype(jnp.int32), st["cx_state"]
    )
    sw = is_lps & (jnp.take(sw_t, state) == 1)
    new_mps = jnp.where(sw, 1 - mps, mps)
    st["cx_mps"] = jnp.where(onehot, new_mps[:, None], st["cx_mps"])

    st["a"] = jnp.where(mask, a_sub, a)
    st["a"] = jnp.where(cond_ex | (is_lps & ~cond_ex_l), qe, st["a"])
    return _enc_renorm(jax, jnp, st, renorm_mps | is_lps)


def _enc_flush(jax, jnp, st):
    tempc = st["c"] + st["a"]
    c = st["c"] | 0xFFFF
    c = jnp.where(c >= tempc, c - 0x8000, c)
    st = dict(st)
    st["c"] = c
    on = jnp.ones_like(st["a"], dtype=bool)
    for _ in range(2):
        # shift C by CT without int32 overflow: only bits <= 27 of the
        # result are ever read (bit 27 is the carry), so pre-mask the input
        st["c"] = (st["c"] & (0xFFFFFFF >> st["ct"])) << st["ct"]
        st = _enc_byteout(jax, jnp, st, on)
    return st


# ------------------------------------------------------------- scan bodies
def _neigh(jnp, plane_arr, y, x):
    """3x3 window [3,3,N] around padded coords (y, x) from [H+2,W+2,N]."""
    import jax

    return jax.lax.dynamic_slice(
        plane_arr, (y - 1, x - 1, 0), (3, 3, plane_arr.shape[2])
    )


def _zc_ctx(jax, jnp, sig, orients_oh, y, x, zc_lut):
    win = _neigh(jnp, sig, y, x)
    hcnt = win[1, 0] + win[1, 2]
    vcnt = win[0, 1] + win[2, 1]
    dcnt = win[0, 0] + win[0, 2] + win[2, 0] + win[2, 2]
    idx = hcnt * 15 + vcnt * 5 + dcnt
    # zc_lut: [4, 45]; orient one-hot [N, 4]
    vals = jnp.take(zc_lut, idx[None, :] + 45 * jnp.arange(4)[:, None])  # [4, N]
    ctx = jnp.sum(vals * orients_oh.T, axis=0).astype(jnp.int32)
    return ctx, hcnt + vcnt + dcnt


def _sc_ctx(jax, jnp, sig, sgn, y, x, sc_ctx_t, sc_xor_t):
    ws = _neigh(jnp, sig, y, x)
    wg = _neigh(jnp, sgn, y, x)
    contrib = lambda a, b: ws[a, b] * (1 - 2 * wg[a, b])
    hbar = jnp.clip(contrib(1, 0) + contrib(1, 2), -1, 1)
    vbar = jnp.clip(contrib(0, 1) + contrib(2, 1), -1, 1)
    idx = (hbar + 1) * 3 + (vbar + 1)
    return jnp.take(sc_ctx_t, idx).astype(jnp.int32), jnp.take(sc_xor_t, idx)


def _set_at(jax, jnp, plane_arr, y, x, vals):
    return jax.lax.dynamic_update_slice(plane_arr, vals[None, None, :], (y, x, 0))


def _get_at(jax, jnp, plane_arr, y, x):
    return jax.lax.dynamic_slice(plane_arr, (y, x, 0), (1, 1, plane_arr.shape[2]))[0, 0]


# ================================================================= encoder
def _build_encoder(jax, jnp, H, W, N, max_bytes):
    tables = _mq_tables(jnp)
    zc_lut = jnp.asarray(_ZC_LUT.reshape(-1), dtype=jnp.int32)
    sc_ctx_t = jnp.asarray(_SC_CTX, dtype=jnp.int32)
    sc_xor_t = jnp.asarray(_SC_XOR, dtype=jnp.int32)
    nstripes = (H + 3) // 4

    # the in-block predicate [H, W, N] is data, closed over inside jit
    def make(inb):
        def mq_enc(st, bit, ctx, mask):
            return _enc_encode(jax, jnp, st, bit, ctx, mask, tables)

        def code_sign(st, y, x, became):
            sc, xr = _sc_ctx(jax, jnp, st["sig"], st["sgn"], y, x, sc_ctx_t, sc_xor_t)
            sbit = (_get_at(jax, jnp, st["sgn"], y, x) ^ xr).astype(jnp.int32)
            st = mq_enc(st, sbit, sc, became)
            st["sig"] = _set_at(
                jax, jnp, st["sig"],
                y, x,
                jnp.where(became, 1, _get_at(jax, jnp, st["sig"], y, x)),
            )
            return st

        def spp_body(st, y, x, plane, lanes_m):
            pos_inb = jax.lax.dynamic_slice(inb, (y - 1, x - 1, 0), (1, 1, N))[0, 0]
            sig_v = _get_at(jax, jnp, st["sig"], y, x)
            ctx, ncnt = _zc_ctx(jax, jnp, st["sig"], st["or_oh"], y, x, zc_lut)
            code = lanes_m & (pos_inb == 1) & (sig_v == 0) & (ncnt > 0)
            bit = ((_get_at(jax, jnp, st["mag"], y, x) >> plane) & 1).astype(jnp.int32)
            st = mq_enc(st, bit, ctx, code)
            vis = _get_at(jax, jnp, st["visited"], y, x)
            st["visited"] = _set_at(
                jax, jnp, st["visited"], y, x, jnp.where(code, 1, vis)
            )
            became = code & (bit == 1)
            st = code_sign(st, y, x, became)
            return st

        def mrp_body(st, y, x, plane, lanes_m):
            pos_inb = jax.lax.dynamic_slice(inb, (y - 1, x - 1, 0), (1, 1, N))[0, 0]
            sig_v = _get_at(jax, jnp, st["sig"], y, x)
            vis = _get_at(jax, jnp, st["visited"], y, x)
            code = lanes_m & (pos_inb == 1) & (sig_v == 1) & (vis == 0)
            _, ncnt = _zc_ctx(jax, jnp, st["sig"], st["or_oh"], y, x, zc_lut)
            ref = _get_at(jax, jnp, st["refined"], y, x)
            ctx = jnp.where(
                ref == 1, CTX_MR0 + 2, jnp.where(ncnt > 0, CTX_MR0 + 1, CTX_MR0)
            ).astype(jnp.int32)
            bit = ((_get_at(jax, jnp, st["mag"], y, x) >> plane) & 1).astype(jnp.int32)
            st = mq_enc(st, bit, ctx, code)
            st["refined"] = _set_at(
                jax, jnp, st["refined"], y, x, jnp.where(code, 1, ref)
            )
            return st

        def cup_col(st, s_idx, x, plane, lanes_m):
            y0 = 4 * s_idx + 1
            # RL eligibility over the 4 rows
            rl = lanes_m & (st["full_stripe"][s_idx] == 1)
            colw = jax.lax.dynamic_slice(inb, (4 * s_idx, x - 1, 0), (4, 1, N))[:, 0]
            rl = rl & (colw[0] == 1)  # x within lane width, row0 in block
            first_k = jnp.full((N,), 4, dtype=jnp.int32)
            bits4 = []
            for k in range(4):
                y = y0 + k
                sig_v = _get_at(jax, jnp, st["sig"], y, x)
                vis = _get_at(jax, jnp, st["visited"], y, x)
                _, ncnt = _zc_ctx(jax, jnp, st["sig"], st["or_oh"], y, x, zc_lut)
                rl = rl & (sig_v == 0) & (vis == 0) & (ncnt == 0)
                bits4.append(
                    ((_get_at(jax, jnp, st["mag"], y, x) >> plane) & 1).astype(jnp.int32)
                )
            for k in range(3, -1, -1):
                first_k = jnp.where(rl & (bits4[k] == 1), k, first_k)
            rl_bit = jnp.where(rl & (first_k < 4), 1, 0).astype(jnp.int32)
            rl_ctx = jnp.full((N,), CTX_RL, dtype=jnp.int32)
            uni_ctx = jnp.full((N,), CTX_UNI, dtype=jnp.int32)
            st = mq_enc(st, rl_bit, rl_ctx, rl)
            sigcol = rl & (rl_bit == 1)
            st = mq_enc(st, (first_k >> 1) & 1, uni_ctx, sigcol)
            st = mq_enc(st, first_k & 1, uni_ctx, sigcol)
            skip_rl0 = rl & (rl_bit == 0)
            for k in range(4):
                y = y0 + k
                pos_inb = jax.lax.dynamic_slice(inb, (y - 1, x - 1, 0), (1, 1, N))[0, 0]
                sig_v = _get_at(jax, jnp, st["sig"], y, x)
                vis = _get_at(jax, jnp, st["visited"], y, x)
                base = (
                    lanes_m & (pos_inb == 1) & (sig_v == 0) & (vis == 0) & ~skip_rl0
                )
                pre_run = rl & (rl_bit == 1) & (k < first_k)
                implied = rl & (rl_bit == 1) & (k == first_k)
                zc_code = base & ~pre_run & ~implied
                ctx, _ = _zc_ctx(jax, jnp, st["sig"], st["or_oh"], y, x, zc_lut)
                bit = ((_get_at(jax, jnp, st["mag"], y, x) >> plane) & 1).astype(jnp.int32)
                st = mq_enc(st, bit, ctx, zc_code)
                became = (zc_code & (bit == 1)) | implied
                st = code_sign(st, y, x, became)
            return st

        def pass_loop(st, plane, lanes_m, kind):
            def stripe_loop(s_idx, st):
                def col_loop(x, st):
                    if kind == 2:
                        return cup_col(st, s_idx, x + 1, plane, lanes_m)
                    st2 = st
                    for k in range(4):
                        y = 4 * s_idx + k + 1
                        if kind == 0:
                            st2 = spp_body(st2, y, x + 1, plane, lanes_m)
                        else:
                            st2 = mrp_body(st2, y, x + 1, plane, lanes_m)
                    return st2

                return jax.lax.fori_loop(0, W, col_loop, st)

            return jax.lax.fori_loop(0, nstripes, stripe_loop, st)

        def plane_body(p_rev, carry):
            st, numbps, pmax = carry
            plane = pmax - 1 - p_rev
            spp_lanes = (numbps - 1 > plane) & (plane >= 0)
            cup_lanes = (numbps - 1 >= plane) & (plane >= 0)
            st = pass_loop(st, plane, spp_lanes, 0)
            st = pass_loop(st, plane, spp_lanes, 1)
            st = pass_loop(st, plane, cup_lanes, 2)
            st = dict(st)
            st["visited"] = jnp.zeros_like(st["visited"])
            return (st, numbps, pmax)

        def encode(mag, sgn, or_oh, inb_dyn, full_stripe, numbps, pmax):
            st = {
                "mag": mag,
                "sgn": sgn,
                "sig": jnp.zeros((H + 2, W + 2, N), jnp.int32),
                "visited": jnp.zeros((H + 2, W + 2, N), jnp.int32),
                "refined": jnp.zeros((H + 2, W + 2, N), jnp.int32),
                "or_oh": or_oh,
                "full_stripe": full_stripe,
                "a": jnp.full((N,), 0x8000, jnp.int32),
                "c": jnp.zeros((N,), jnp.int32),
                "ct": jnp.full((N,), 12, jnp.int32),
                "buf": jnp.zeros((max_bytes, N), jnp.uint8),
                "pos": jnp.zeros((N,), jnp.int32),
                "cx_state": jnp.tile(
                    jnp.asarray(
                        [4, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 3, 46],
                        jnp.int32,
                    )[None, :],
                    (N, 1),
                ),
                "cx_mps": jnp.zeros((N, 19), jnp.int32),
            }
            st, _, _ = jax.lax.fori_loop(
                0, pmax, plane_body, (st, numbps, jnp.int32(pmax))
            )
            st = _enc_flush(jax, jnp, st)
            lanes = jnp.arange(N)
            lastb = st["buf"][st["pos"], lanes]
            lengths = st["pos"] + jnp.where(lastb != 0xFF, 1, 0) - 1
            return st["buf"], lengths

        return encode

    return make


def encode_cblks(coeffs, heights, widths, orients, num_threads: int = 0, styles=None):
    if styles is not None and int(np.max(np.asarray(styles), initial=0)) != 0:
        from .ebcot_np import encode_cblks as _np_enc

        return _np_enc(coeffs, heights, widths, orients, styles=styles)
    """Backend-API entry: host numpy in/out, device lockstep inside."""
    jax, jnp = _j()
    coeffs = np.ascontiguousarray(coeffs, dtype=np.int64)
    n, h, w = coeffs.shape
    mag_np = np.abs(coeffs)
    sgn_np = (coeffs < 0).astype(np.int64)

    # in-block predicate, lanes minor: [h, w, n]
    inb = (
        (np.arange(h)[:, None, None] < np.asarray(heights)[None, None, :])
        & (np.arange(w)[None, :, None] < np.asarray(widths)[None, None, :])
    ).astype(np.int32)

    mx = np.where(inb.transpose(2, 0, 1) > 0, mag_np, 0).reshape(n, -1).max(axis=1)
    numbps = np.zeros(n, dtype=np.int64)
    nz = mx > 0
    numbps[nz] = np.floor(np.log2(mx[nz])).astype(np.int64) + 1
    pmax = int(numbps.max(initial=0))
    npasses = np.maximum(numbps * 3 - 2, 0)
    max_bytes = max(64, (pmax * h * w) // 4 + 128)

    if pmax == 0:
        return T1EncodeResult(
            data=np.zeros((n, 1), np.uint8),
            lengths=np.zeros(n, np.int64),
            numbps=numbps,
            npasses=npasses,
            pass_rates=np.zeros((n, 1), np.int64),
            pass_dist=np.zeros((n, 1), np.float64),
        )

    nstripes = (h + 3) // 4
    full_stripe = (
        (4 * np.arange(nstripes)[:, None] + 4) <= np.asarray(heights)[None, :]
    ).astype(np.int32)

    # pad state planes (lanes minor)
    mag_d = np.zeros((h + 2, w + 2, n), dtype=np.int32)
    mag_d[1 : h + 1, 1 : w + 1, :] = np.transpose(mag_np, (1, 2, 0))
    sgn_d = np.zeros((h + 2, w + 2, n), dtype=np.int32)
    sgn_d[1 : h + 1, 1 : w + 1, :] = np.transpose(sgn_np, (1, 2, 0))
    or_oh = (np.arange(4)[None, :] == np.asarray(orients)[:, None]).astype(np.int32)

    enc = _get_cached_encoder(h, w, n, max_bytes)
    buf, lengths = enc(
        jnp.asarray(mag_d),
        jnp.asarray(sgn_d),
        jnp.asarray(or_oh),
        jnp.asarray(inb),
        jnp.asarray(full_stripe),
        jnp.asarray(numbps, dtype=jnp.int32),
        pmax,
    )
    buf = np.asarray(buf)  # [max_bytes, N]
    lengths = np.asarray(lengths).astype(np.int64)
    lengths = np.where(npasses > 0, lengths, 0)
    data = np.ascontiguousarray(buf.T[:, 1:])
    rates = np.tile(lengths[:, None], (1, max(int(npasses.max(initial=0)), 1)))
    # conservative uniform rates (exact final length on every pass): callers
    # doing PCRD should prefer the native backend; this keeps the API total.
    return T1EncodeResult(
        data=data,
        lengths=lengths,
        numbps=numbps,
        npasses=npasses,
        pass_rates=rates,
        pass_dist=np.zeros_like(rates, dtype=np.float64),
    )


_ENC_CACHE: dict = {}


def _get_cached_encoder(h, w, n, max_bytes):
    jax, jnp = _j()
    key = (h, w, n, max_bytes)
    if key not in _ENC_CACHE:
        make = _build_encoder(jax, jnp, h, w, n, max_bytes)

        def run(mag, sgn, or_oh, inb, full_stripe, numbps, pmax):
            encode = make(inb)
            return encode(mag, sgn, or_oh, inb, full_stripe, numbps, pmax)

        _ENC_CACHE[key] = jax.jit(run, static_argnums=(6,))
    return _ENC_CACHE[key]
