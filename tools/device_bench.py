#!/usr/bin/env python
"""Device-resident end-to-end encode benchmark -> DEVICE_BENCH.json.

Times the full device encode chain (DC shift -> MCT -> DWT -> quant ->
HT T1) as ONE jitted XLA program with inputs pre-staged on the chip,
plus each stage in isolation, and reports MP/s (samples/s), estimated
bytes moved and %-of-roofline per stage. Host<->device transfer over
this rig's tunnel is timed separately (a production PCIe/ICI attach is
3-4 orders of magnitude faster and is not the subject of measurement).

The measurement discipline matches the reference's micro-benchmarks
(/root/reference/src/lib/jp2/util/bench_dwt.cpp:133); the pipeline shape
matches its per-tile encode chain (tile/TileProcessor.cpp:202-615).

Usage:  python tools/device_bench.py [--h 2160 --w 3840] [--check]
One command regenerates DEVICE_BENCH.json at the repo root.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from grok_tpu.codestream.quantizer import apply_band_quant, compute_signalled_quant
from grok_tpu.codestream.structs import SizComponent, TccpStyle
from grok_tpu.core.rect import Rect
from grok_tpu.tile.geometry import build_tile_comp_geometry

# v5e lite HBM bandwidth (bytes/s), the roofline for these memory-bound
# kernels; ~819 GB/s per chip.
HBM_BW = 819e9


def natural_image(h, w, nc=3):
    """Same synthetic natural-statistics content bench.py uses."""
    rng = np.random.default_rng(12345)
    yy, xx = np.mgrid[0:h, 0:w]
    out = np.zeros((h, w, nc), dtype=np.uint8)
    for c in range(nc):
        base = (
            96 + 60 * np.sin(2 * np.pi * (xx / (97 + 31 * c)))
            + 50 * np.sin(2 * np.pi * (yy / (61 + 17 * c)))
            + 18 * ((xx // 32 + yy // 32) % 2)
        )
        noise = rng.normal(0, 9, size=(h, w))
        out[..., c] = np.clip(base + noise, 0, 255).astype(np.uint8)
    return out


def build_setup(h, w, nc, nres):
    tccps, geoms, comps = [], [], []
    for c in range(nc):
        t = TccpStyle(num_resolutions=nres, irreversible=False)
        prec = 8 + (1 if (nc >= 3 and c in (1, 2)) else 0)  # RCT chroma
        compute_signalled_quant(t, prec)
        g = build_tile_comp_geometry(c, Rect(0, 0, w, h), t)
        apply_band_quant(g, t, prec)
        tccps.append(t)
        geoms.append(g)
        comps.append(SizComponent(prec=8))
    return geoms, tccps, comps


def block_specs(geoms, bh=64, bw=64):
    """Static extraction plan: band slices -> padded [*,64,64] batches."""
    from grok_tpu.ops.jax_pipeline import _band_origin

    specs, heights, widths = [], [], []
    for c, g in enumerate(geoms):
        for res in g.resolutions:
            for band in res.bands:
                oy, ox = _band_origin(g, res.r, band.orient)
                hb, wb = band.rect.height, band.rect.width
                if hb == 0 or wb == 0:
                    continue
                nby = -(-hb // bh)
                nbx = -(-wb // bw)
                specs.append((c, oy, ox, hb, wb, nby, nbx))
                for by in range(nby):
                    for bx in range(nbx):
                        heights.append(min(bh, hb - bh * by))
                        widths.append(min(bw, wb - bw * bx))
    return specs, np.array(heights, np.int32), np.array(widths, np.int32)


def build_chain(h, w, nc, nres, mmax):
    """One jitted program: image components -> HT segment arrays."""
    import jax
    import jax.numpy as jnp

    from grok_tpu.ops.jax_pipeline import make_forward_fn
    from grok_tpu.t1 import ht_jax

    geoms, tccps, comps = build_setup(h, w, nc, nres)
    mct = 1 if nc >= 3 else 0
    fwd = make_forward_fn(geoms, tccps, comps, mct)
    specs, heights, widths = block_specs(geoms)
    n_blocks = len(heights)

    qh, qw = 32, 32
    n_pairs = qh * (qw // 2)
    ms_bits = 64 * 64 * mmax + 64
    vlc_bits = 4 + 30 * n_pairs + 32
    mel_bits = 6 * (3 * n_pairs + 1) + 32
    caps = {
        "ms_words": (ms_bits + 31) // 32 + 1,
        "vlc_words": (vlc_bits + 31) // 32 + 1,
        "mel_words": (mel_bits + 31) // 32 + 1,
        "mmax": mmax,  # enables quad chunking in the MagSgn pack
    }
    # NOTE: heights/widths must stay runtime arguments — baking them in as
    # closed-over constants lets XLA constant-fold the size masks, which
    # miscompiles (device fault) on the axon TPU platform.
    hs = jnp.asarray(heights)
    ws = jnp.asarray(widths)

    def extract(packed):
        blocks = []
        for (c, oy, ox, hb, wb, nby, nbx) in specs:
            a = jax.lax.dynamic_slice(packed[c], (oy, ox), (hb, wb))
            a = jnp.pad(a, ((0, nby * 64 - hb), (0, nbx * 64 - wb)))
            blocks.append(
                a.reshape(nby, 64, nbx, 64).transpose(0, 2, 1, 3)
                .reshape(-1, 64, 64))
        return jnp.concatenate(blocks, axis=0)

    def chain(hs_, ws_, *xs):
        batch = extract(fwd(*xs))
        return ht_jax._encode_device(batch, hs_, ws_, 64, 64, caps)

    def transform_only(*xs):
        return extract(fwd(*xs))

    def t1_only(batch, hs_, ws_):
        return ht_jax._encode_device(batch, hs_, ws_, 64, 64, caps)

    # Small "digest" programs: reduce a stage's output to one scalar so a
    # timed region can end in a single value fetch (the only real sync on
    # axon — see _fetch) without pulling whole segment arrays over the
    # 0.7 MB/s tunnel.
    def digest(d):
        import jax.numpy as jnp

        return (d["dist"].sum()
                + d["ms"][0].astype(jnp.uint32).sum().astype(jnp.float32)
                + d["vlc"][0].astype(jnp.uint32).sum().astype(jnp.float32))

    def chain_digest(hs_, ws_, *xs):
        batch = extract(fwd(*xs))
        return digest(ht_jax._encode_device(batch, hs_, ws_, 64, 64, caps))

    def fwd_digest(*xs):
        import jax.numpy as jnp

        return extract(fwd(*xs)).sum().astype(jnp.float32)

    def t1_digest(batch, hs_, ws_):
        return digest(ht_jax._encode_device(batch, hs_, ws_, 64, 64, caps))

    meta = dict(n_blocks=n_blocks, heights=heights, widths=widths, caps=caps,
                hs=hs, ws=ws)
    loops = {
        "chain": jax.jit(chain_digest),
        "fwd": jax.jit(fwd_digest),
        "t1": jax.jit(t1_digest),
    }
    return (jax.jit(chain), jax.jit(transform_only), jax.jit(t1_only),
            loops, meta)


def _trace_device_ms(fn, args, iters=4):
    """Per-iteration device-stream time from a jax.profiler trace.

    The queued-dispatch differencing includes this rig's per-execution
    tunnel dispatch cost (measured ~2x the device time at 4K batch
    shapes); the profiler's device-lane jit spans time what the CHIP
    actually spends — the production-relevant number (a PCIe/ICI attach
    has us-class dispatch)."""
    import glob
    import gzip
    import json as _json
    import tempfile

    import jax

    try:
        with tempfile.TemporaryDirectory() as td:
            _fetch(fn(*args))
            with jax.profiler.trace(td):
                out = None
                for _ in range(iters):
                    out = fn(*args)
                _fetch(out)
            files = glob.glob(
                os.path.join(td, "plugins", "profile", "*",
                             "*.trace.json.gz"))
            if not files:
                return None
            d = _json.load(gzip.open(sorted(files)[-1]))
            tot = 0
            for e in d.get("traceEvents", []):
                if (e.get("ph") == "X" and "dur" in e
                        and str(e.get("name", "")).startswith("jit")):
                    tot += e["dur"]
            return tot / iters / 1000.0 if tot else None
    except Exception:
        return None


def _fetch(x):
    """Value fetch = the only real synchronization on the axon platform:
    block_until_ready returns immediately there (measured: a 48-iteration
    fori chain 'completes' in 0.1 ms while one dispatch reads 0.9 ms), so
    every timed region must end in a device->host scalar read."""
    return float(np.asarray(x).ravel()[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=2160)
    ap.add_argument("--w", type=int, default=3840)
    ap.add_argument("--nc", type=int, default=3)
    ap.add_argument("--nres", type=int, default=6)
    ap.add_argument("--loops", type=int, default=48,
                    help="loop-amortization factor for per-stage timing")
    ap.add_argument("--check", action="store_true",
                    help="validate segments vs the host coder (small size)")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "DEVICE_BENCH.json"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)

    h, w, nc = args.h, args.w, args.nc
    img = natural_image(h, w, nc)
    samples = h * w * nc

    # magnitude bound: the production encoder (ht_jax.encode_cleanup_batch)
    # sizes the MagSgn capacity from the ACTUAL batch maximum, not the
    # signalled MAGB bound — the pack stage cost scales with that
    # capacity, so the bench must match production. Run the transform
    # once under the conservative bound to read the real maximum, then
    # build the measured chain with it.
    _, tccps, _ = build_setup(h, w, nc, args.nres)
    mmax_sig = max(max(t.step_exps) + t.guard_bits - 1 for t in tccps) + 1

    t_build0 = time.perf_counter()
    chain, transform_only, t1_only, loops, meta = build_chain(
        h, w, nc, args.nres, mmax_sig)
    import jax.numpy as _jnp

    _probe = transform_only(*[
        jax.device_put(np.ascontiguousarray(img[..., c], dtype=np.int32))
        for c in range(nc)])
    mx_actual = int(_jnp.abs(_probe).max())
    mmax = max(int(2 * mx_actual - 1).bit_length(), 1) if mx_actual else 1
    if mmax != mmax_sig:
        print(f"actual-content mmax {mmax} (signalled bound {mmax_sig}); "
              "rebuilding the measured chain", flush=True)
        chain, transform_only, t1_only, loops, meta = build_chain(
            h, w, nc, args.nres, mmax)
    comps_np = [np.ascontiguousarray(img[..., c], dtype=np.int32)
                for c in range(nc)]

    t0 = time.perf_counter()
    comps_dev = [jax.device_put(x, dev) for x in comps_np]
    hs_dev = jax.device_put(meta["hs"], dev)
    ws_dev = jax.device_put(meta["ws"], dev)
    for c in comps_dev:
        _fetch(c[:1, :1])  # forces the staging transfers to complete
    h2d_s = time.perf_counter() - t0

    chain_args = (hs_dev, ws_dev, *comps_dev)
    print("compiling + first run (tunnel-slow on this rig)...", flush=True)
    t0 = time.perf_counter()
    out0 = chain(*chain_args)
    _fetch(out0["dist"][:1])
    compile_s = time.perf_counter() - t0
    print(f"cold chain: {compile_s:.1f}s", flush=True)

    batch_dev = transform_only(*comps_dev)

    # Queued-dispatch amortization: submit K (then 2K) back-to-back
    # executions of the jitted digest program — the device stream
    # serializes them — and sync ONCE with a scalar fetch of the last
    # result. Differencing (t2K - tK)/K cancels the constant sync/fetch
    # RTT; async dispatch keeps per-submission host cost off the device
    # timeline. (A fori_loop-in-one-program variant would amortize
    # harder, but wrapping the chain in lax.fori_loop faults the axon
    # TPU worker — a platform miscompile, not a capacity issue: the
    # identical body runs fine as a standalone program.)
    def loop_time(fn, args, k, label, reps=3):
        t0 = time.perf_counter()
        _fetch(fn(*args))  # compile + warm
        print(f"  {label}: compiled+warm in {time.perf_counter()-t0:.1f}s",
              flush=True)
        def run(n):
            t0 = time.perf_counter()
            out = None
            for _ in range(n):
                out = fn(*args)
            _fetch(out)
            return time.perf_counter() - t0
        run(2)
        tk = t2k = float("inf")
        for r in range(reps):
            tk = min(tk, run(k))
            t2k = min(t2k, run(2 * k))
            print(f"  {label}: rep {r}: K={k} {tk:.2f}s 2K {t2k:.2f}s",
                  flush=True)
        return max((t2k - tk) / k, 1e-9), tk, t2k

    K = args.loops
    e2e_s, e2e_tk, e2e_t2k = loop_time(
        loops["chain"], (hs_dev, ws_dev, *comps_dev), K, "chain")
    fwd_s, fwd_tk, fwd_t2k = loop_time(loops["fwd"], tuple(comps_dev), K,
                                       "fwd")
    t1_s, t1_tk, t1_t2k = loop_time(loops["t1"], (batch_dev, hs_dev, ws_dev),
                                    K, "t1")
    raw_loops = {
        "chain_Ks_2Ks": [round(e2e_tk, 4), round(e2e_t2k, 4)],
        "fwd_Ks_2Ks": [round(fwd_tk, 4), round(fwd_t2k, 4)],
        "t1_Ks_2Ks": [round(t1_tk, 4), round(t1_t2k, 4)],
    }

    # ---- decode stage: compact the encoded segments on the host (the
    # production split) and time the device cleanup-decode program
    from grok_tpu.t1 import ht_jax, ht_jax_dec

    out_enc = chain(*chain_args)
    segs = ht_jax._compact(
        {k: [np.asarray(x) for x in out_enc[k]]
         if k in ("ms", "mel", "vlc") else np.asarray(out_enc[k])
         for k in out_enc},
        meta["n_blocks"], meta["heights"], meta["widths"])
    nb = meta["n_blocks"]
    dlens = np.array([len(s) for s in segs], dtype=np.int64)
    L = max(int(dlens.max(initial=1)), 1)
    ddata = np.zeros((nb, L), dtype=np.uint8)
    for i, s in enumerate(segs):
        ddata[i, : len(s)] = np.frombuffer(s, dtype=np.uint8)
    scup = np.zeros(nb, dtype=np.int32)
    for i in range(nb):
        ln = int(dlens[i])
        if ln >= 2:
            scup[i] = (int(ddata[i, ln - 1]) << 4) | (int(ddata[i, ln - 2]) & 0xF)
    ms_len = np.maximum(dlens.astype(np.int32) - scup, 0)
    Lc = 64
    while Lc < L:
        Lc *= 2
    Nc = 64
    while Nc < nb:
        Nc *= 2
    msc = 64
    while msc < int(ms_len.max(initial=0)):
        msc *= 2
    scc = max(4096, 64)
    ddata_p = np.pad(ddata, ((0, Nc - nb), (0, Lc - L)))
    scup_p = np.pad(scup, (0, Nc - nb))
    ms_len_p = np.pad(ms_len, (0, Nc - nb))
    hs_p = np.pad(meta["heights"].astype(np.int32), (0, Nc - nb))
    ws_p = np.pad(meta["widths"].astype(np.int32), (0, Nc - nb))
    dec_fn = ht_jax_dec._build(Nc, Lc, 64, 64, msc, scc)
    import jax.numpy as __jnp

    mel_r, vlc_r, nib_b = ht_jax_dec.preslice_suffix(
        ddata_p, ms_len_p, scup_p, scc)
    dec_args = tuple(jax.device_put(__jnp.asarray(x)) for x in
                     (ddata_p, mel_r, vlc_r, nib_b, ms_len_p, scup_p,
                      hs_p, ws_p))

    def dec_digest(*a):
        out, ok = dec_fn(*a)
        return out.sum(dtype=__jnp.int32) + ok.sum(dtype=__jnp.int32)

    dec_jit = jax.jit(dec_digest)
    dec_s, dec_tk, dec_t2k = loop_time(dec_jit, dec_args, max(K // 4, 4),
                                       "dec")
    dev_dec_ms = _trace_device_ms(dec_jit, dec_args)

    # device-only times from the profiler trace (see _trace_device_ms)
    dev_chain_ms = _trace_device_ms(
        loops["chain"], (hs_dev, ws_dev, *comps_dev))
    dev_fwd_ms = _trace_device_ms(loops["fwd"], tuple(comps_dev))
    dev_t1_ms = _trace_device_ms(loops["t1"], (batch_dev, hs_dev, ws_dev))

    # single-dispatch wall time (includes the launch + fetch floor)
    _fetch(loops["chain"](*chain_args))
    e2e_1 = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _fetch(loops["chain"](*chain_args))
        e2e_1 = min(e2e_1, time.perf_counter() - t0)

    # ---- roofline estimates (bytes touched in HBM, int32 planes)
    area4 = samples * 4
    # DWT: per level, vertical+horizontal lifting passes read+write the
    # level plane (~4/3 total area across the pyramid), plus DC/MCT r+w
    fwd_bytes = area4 * 2 + area4 * (4 / 3) * 2 * 2
    # T1: quad math reads the batch and builds item arrays (~6 planes of
    # per-sample int32 traffic), packing + stuffing streams ~2 more
    t1_bytes = area4 * 9
    mk = lambda t, b: {
        "ms": round(t * 1e3, 3),
        "mp_s": round(samples / t / 1e6, 2),
        "est_bytes_moved": int(b),
        "pct_roofline": round(100 * (b / t) / HBM_BW, 1),
    }
    result = {
        "device": str(dev),
        "image": f"{w}x{h}x{nc} natural (synthetic)",
        "config": f"ht_lossless 5/3, {args.nres} res, RCT, 64x64 cblks",
        "n_codeblocks": int(meta["n_blocks"]),
        "samples_mp": round(samples / 1e6, 2),
        "stages": {
            "transform_dc_mct_dwt_quant": mk(fwd_s, fwd_bytes),
            "t1_ht_cleanup_encode": mk(t1_s, t1_bytes),
            "t1_ht_cleanup_decode": mk(dec_s, t1_bytes),
            "end_to_end_chain": mk(e2e_s, fwd_bytes + t1_bytes),
        },
        "device_only_trace": {
            "method": "jax.profiler device-lane jit spans per iteration; "
                      "excludes this rig's per-dispatch tunnel overhead "
                      "(production attach is PCIe/ICI with us dispatch)",
            "chain_ms": round(dev_chain_ms, 3) if dev_chain_ms else None,
            "transform_ms": round(dev_fwd_ms, 3) if dev_fwd_ms else None,
            "t1_ht_ms": round(dev_t1_ms, 3) if dev_t1_ms else None,
            "t1_ht_mp_s": round(samples / dev_t1_ms / 1e3, 1)
            if dev_t1_ms else None,
            "t1_ht_dec_ms": round(dev_dec_ms, 3) if dev_dec_ms else None,
            "t1_ht_dec_mp_s": round(samples / dev_dec_ms / 1e3, 1)
            if dev_dec_ms else None,
            "chain_mp_s": round(samples / dev_chain_ms / 1e3, 1)
            if dev_chain_ms else None,
        },
        "timing": {
            "method": f"queued-dispatch (2K-K)/K difference, K={K}; "
                      "K back-to-back executions synced by ONE scalar "
                      "value fetch (axon block_until_ready is a no-op); "
                      "differencing cancels the constant sync RTT",
            "single_dispatch_chain_ms": round(e2e_1 * 1e3, 3),
            "raw_loop_wall_s": raw_loops,
        },
        "transfer": {
            "h2d_s": round(h2d_s, 2),
            "note": "host<->device transfer rides the axon tunnel on this "
                    "rig; excluded from device-resident numbers "
                    "(production attach is PCIe/ICI)",
        },
        "compile_s": round(compile_s, 1),
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }

    # write timings immediately — a late tunnel fault must not lose them
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
        f.write("\n")

    if args.check:
        from grok_tpu.t1 import ht, ht_jax

        out = chain(*chain_args)
        segs = ht_jax._compact(
            {k: [np.asarray(x) for x in out[k]] if k in ("ms", "mel", "vlc")
             else np.asarray(out[k]) for k in out},
            meta["n_blocks"], meta["heights"], meta["widths"])
        batch_host = np.asarray(batch_dev)
        nb = meta["n_blocks"]
        ref = ht.encode_cblks(  # batched native host coder (fast oracle)
            batch_host.astype(np.int64), meta["heights"].astype(np.int64),
            meta["widths"].astype(np.int64), np.zeros(nb, np.int64),
            device=False)
        bad = 0
        for i in range(nb):
            ok = segs[i] == bytes(ref.data[i, : ref.lengths[i]])
            bad += not ok
        result["check"] = {"blocks": nb, "mismatches": bad}
        print(f"check: {bad} mismatches / {meta['n_blocks']} blocks")
        assert bad == 0

    print(json.dumps(result, indent=2))
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
        f.write("\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
