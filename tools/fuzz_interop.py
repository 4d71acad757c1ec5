"""Randomized reference-interop fuzz: our encode -> grk_decompress and
grk_compress -> our decode across random geometry/style/progression/tiling.

A mismatch is only counted as OUR failure if the reference can decode its
OWN stream for the same config — Grok 9.2.0 mis-reconstructs tiles whose
canvas y-origin is odd (see docs/STATUS.md "Reference bugs found"), so
those configs are attributed to the reference and reported separately.

Usage: python tools/fuzz_interop.py [seed] [trials]
"""
import os
import subprocess
import sys
import tempfile

import numpy as np
from PIL import Image as PImage

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import grok_tpu as gk
from grok_tpu.core.params import ProgressionOrder

GRK = "/tmp/grok-build/bin"


def grok_self_ok(src, args, td, dargs=()):
    """Does the reference roundtrip its OWN stream for this config?
    Compares raw PGX component planes (the PNG writer path can mask
    per-component diffs)."""
    import glob as _glob

    j = os.path.join(td, "self.j2k")
    for f in _glob.glob(os.path.join(td, "self*.pgx")):
        os.unlink(f)
    o = os.path.join(td, "self.pgx")
    if subprocess.run([f"{GRK}/grk_compress", "-i", src, "-o", j, *args],
                      capture_output=True).returncode:
        return None  # reference cannot encode this config at all
    if subprocess.run([f"{GRK}/grk_decompress", "-i", j, "-o", o, *dargs],
                      capture_output=True).returncode:
        return False
    if dargs:
        return True  # decodes cleanly; pixel equality judged elsewhere
    from tests.conftest import read_pgx

    comps = [read_pgx(f)
             for f in sorted(_glob.glob(os.path.join(td, "self*.pgx")))]
    a = np.asarray(PImage.open(src))
    if a.ndim == 2:
        a = a[:, :, None]
    if len(comps) != a.shape[2]:
        return False
    return all(np.array_equal(comps[i], a[:, :, i])
               for i in range(a.shape[2]))


def ref_decode(path, td, dargs=(), pgx=False):
    """Reference decode -> array, or None on failure. With pgx, read the
    raw PGX plane (exact for any bit depth; single-component only)."""
    import glob as _glob

    if pgx:
        for f in _glob.glob(os.path.join(td, "rd*.pgx")):
            os.unlink(f)
        out = os.path.join(td, "rd.pgx")
    else:
        out = os.path.join(td, "rd.png")
    r = subprocess.run([f"{GRK}/grk_decompress", "-i", path, "-o", out,
                        *dargs], capture_output=True)
    if r.returncode:
        return None
    if pgx:
        from tests.conftest import read_pgx

        files = sorted(_glob.glob(os.path.join(td, "rd*.pgx")))
        if not files:
            return None
        planes = [read_pgx(f) for f in files]
        return planes[0] if len(planes) == 1 else np.stack(planes, -1)
    return np.asarray(PImage.open(out))


def reduce_ground_truth(arr, depth, stream, rd):
    """Mathematical LL_rd of the original (lossless 5/3, single tile,
    origin 0): the arbiter for reduced-decode mismatches — the reference's
    -r decode of POC streams can drop later progression segments (see
    docs/STATUS.md reference bugs)."""
    from grok_tpu.core.rect import Rect
    from grok_tpu.ops import dwt as dwt_ops
    from grok_tpu.ops import mct as mct_ops

    info = gk.parse_codestream(bytes(stream))
    tcp = info.header.default_tcp
    siz = info.header.siz
    h, w = arr.shape[:2]
    nc = 1 if arr.ndim == 2 else arr.shape[2]
    off = 1 << (depth - 1)
    comps = [(arr if nc == 1 else arr[:, :, i]).astype(np.int64) - off
             for i in range(nc)]
    if tcp.mct == 1 and nc >= 3:
        comps[0], comps[1], comps[2] = mct_ops.rct_forward(
            np, comps[0], comps[1], comps[2])
    # per-tile transform: the reduced image is the per-tile LL_rd mosaic
    # on the ceil-divided canvas (T.800 B.5; single tile == whole image)
    gh = (h + (1 << rd) - 1) >> rd
    gw = (w + (1 << rd) - 1) >> rd
    outs = [np.zeros((gh, gw), dtype=np.int64) for _ in range(nc)]
    for ti in range(siz.num_tiles):
        tb = siz.tile_bounds(ti)
        oy0 = (tb.y0 + (1 << rd) - 1) >> rd
        ox0 = (tb.x0 + (1 << rd) - 1) >> rd
        oy1 = (tb.y1 + (1 << rd) - 1) >> rd
        ox1 = (tb.x1 + (1 << rd) - 1) >> rd
        for i in range(nc):
            sub = np.ascontiguousarray(comps[i][tb.y0:tb.y1, tb.x0:tb.x1])
            packed = dwt_ops.forward(
                np, sub, Rect(tb.x0, tb.y0, tb.x1, tb.y1), rd, False)
            outs[i][oy0:oy1, ox0:ox1] = packed[: oy1 - oy0, : ox1 - ox0]
    if tcp.mct == 1 and nc >= 3:
        outs[0], outs[1], outs[2] = mct_ops.rct_inverse(
            np, outs[0], outs[1], outs[2])
    res = [np.clip(o + off, 0, (1 << depth) - 1) for o in outs]
    return res[0] if nc == 1 else np.stack(res, -1)


def save_input(arr, depth, td, nc=3):
    """8-bit: PNG (CMYK TIFF for 4 components). >8-bit grayscale: binary
    PGM (2-byte big-endian)."""
    if depth == 8:
        if nc == 4:
            src = os.path.join(td, "s.tif")
            PImage.fromarray(arr, mode="CMYK").save(src)
            return src
        src = os.path.join(td, "s.png")
        PImage.fromarray(arr).save(src)
    else:
        src = os.path.join(td, "s.pgm")
        with open(src, "wb") as f:
            f.write(f"P5\n{arr.shape[1]} {arr.shape[0]}\n{(1 << depth) - 1}\n".encode())
            f.write(arr.astype(">u2").tobytes())
    return src


def main():
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    rng = np.random.default_rng(seed)
    td = tempfile.mkdtemp()
    ours_fail = ref_bug = 0
    for trial in range(trials):
        h = int(rng.integers(40, 400))
        w = int(rng.integers(40, 400))
        if rng.random() < 0.12:
            # signed axis: ours encode -> our decode + reference decode.
            # One-directional: the reference's signed INPUT paths are
            # broken in this build (PGX force8/sign bugs, RAW positive-
            # sample corruption — docs/STATUS.md), but its signed decode
            # is exact, which is what this leg pins.
            sdepth = int(rng.choice([4, 8, 12, 16]))
            sarr = rng.integers(-(1 << (sdepth - 1)), 1 << (sdepth - 1),
                                (h, w)).astype(np.int32)
            skw = dict(num_resolutions=int(rng.integers(1, 7)))
            if rng.random() < 0.4:
                skw["ht"] = True
            sim = gk.Image.from_array(sarr, prec=sdepth, signed=True)
            sblob = gk.compress(sim, gk.CompressParams(**skw))
            sj2k = os.path.join(td, "s.j2k")
            open(sj2k, "wb").write(bytes(sblob))
            sdec = gk.decompress(bytes(sblob)).components[0].data
            sref = ref_decode(sj2k, td, pgx=True)
            if sref is not None and sref.ndim == 3:
                sref = sref[:, :, 0]
            if not (np.array_equal(sdec, sarr)
                    and sref is not None and np.array_equal(sref, sarr)):
                ours_fail += 1
                print(f"trial {trial}: SIGNED mismatch depth={sdepth} "
                      f"kw={skw} self={np.array_equal(sdec, sarr)} "
                      f"ref={None if sref is None else np.array_equal(sref, sarr)}")
            continue
        depth = int(rng.choice([8, 8, 8, 12, 16]))
        nc = int(rng.choice([1, 3, 3, 4])) if depth == 8 else 1
        arr = rng.integers(0, 1 << depth, (h, w, nc) if nc > 1 else (h, w))
        arr = arr.astype(np.uint8 if depth == 8 else np.uint16)
        src = save_input(arr, depth, td, nc)
        use_pgx = depth > 8 or nc == 4  # PGX: exact >8-bit / 4-comp planes
        nres = int(rng.integers(1, 7))
        mode = int(rng.choice([0, 1, 4, 5, 8, 0x15, 0x3F, 64]))
        prog = str(rng.choice(["LRCP", "RLCP", "RPCL", "PCRL", "CPRL"]))
        kw = dict(num_resolutions=nres, progression=ProgressionOrder[prog])
        targs = []
        if mode == 64:
            kw["ht"] = True
        else:
            kw["cblk_style"] = mode
        if rng.random() < 0.4:
            tw, th = int(rng.integers(32, 256)), int(rng.integers(32, 256))
            kw["tile_size"] = (tw, th)
            targs = ["-t", f"{tw},{th}"]
        # new-feature axes: PLT index, quality layers, small precincts
        nlayers = 1
        if mode != 64 and rng.random() < 0.4:
            nlayers = int(rng.integers(2, 4))
            rates = sorted(
                {float(int(r)) for r in rng.integers(2, 80, nlayers - 1)},
                reverse=True,
            ) + [1.0]
            nlayers = len(rates)
            kw["num_layers"] = nlayers
            kw["layer_rates"] = rates
            targs += ["-r", ",".join(str(int(r)) for r in rates)]
        if rng.random() < 0.4:
            kw["write_plt"] = True
            targs += ["-L"]
        if rng.random() < 0.3:
            pe = int(rng.integers(5, 8))
            kw["precinct_sizes"] = [(pe, pe)] * 33
            targs += ["-c", f"[{1 << pe},{1 << pe}]"]
        if rng.random() < 0.3:
            kw["use_sop"] = True
            targs += ["-S"]
        if rng.random() < 0.3:
            kw["use_eph"] = True
            targs += ["-E"]
        if rng.random() < 0.25 and nres >= 2 and "tile_size" not in kw:
            # POC: progression segments splitting resolutions, and (when
            # layered) optionally layers too (single-tile: the reference
            # needs the T0= form)
            from grok_tpu.core.params import ProgressionChange

            rsplit = int(rng.integers(1, nres))
            p1 = str(rng.choice(["LRCP", "RLCP", "RPCL", "PCRL", "CPRL"]))
            p2 = str(rng.choice(["LRCP", "RLCP", "RPCL", "PCRL", "CPRL"]))
            if nlayers > 1 and rng.random() < 0.5:
                # layer-split: segment 1 carries layer 0 of the low
                # resolutions, later segments complete the packet set
                segs = [(0, 0, 1, rsplit, nc, p1),
                        (0, 0, nlayers, nres, nc, p2)]
            else:
                segs = [(0, 0, nlayers, rsplit, nc, p1),
                        (rsplit, 0, nlayers, nres, nc, p2)]
            kw["progression_changes"] = [
                ProgressionChange(rs, cs, le, re, ce, ProgressionOrder[pp])
                for (rs, cs, le, re, ce, pp) in segs
            ]
            targs += ["-P", "/".join(
                f"T0={rs},{cs},{le},{re},{ce},{pp}"
                for (rs, cs, le, re, ce, pp) in segs
            )]
        margs = ["-n", str(nres), "-p", prog, "-M", str(mode if mode != 64 else 64),
                 *targs]
        # decode-side variation: layer truncation / resolution reduction.
        # Truncated decode of the SAME stream must match the reference's
        # truncated decode bit-exactly (deterministic partial decode).
        dargs = []
        dkw = {}
        lossless_cfg = nlayers == 1
        if nlayers > 1 and rng.random() < 0.6:
            ml = int(rng.integers(1, nlayers))
            dargs = ["-l", str(ml)]
            dkw = {"max_layers": ml}
        elif nres > 1 and rng.random() < 0.3:
            rd = int(rng.integers(1, nres))
            dargs = ["-r", str(rd)]
            dkw = {"reduce": rd}
            lossless_cfg = False
        def psnr(a, b):
            mse = ((a.astype(np.float64) - b.astype(np.float64)) ** 2).mean()
            return 1e9 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)

        def layer_trunc_quirk(path, mine):
            """The reference's -l on POC/multi-part streams drops MORE
            than the layer limit (docs/STATUS.md): attribute the mismatch
            to it when our truncation preserves at least its fidelity."""
            if "max_layers" not in dkw:
                return False
            full = gk.decompress(open(path, "rb").read()).to_array()
            full = full[:, :, 0] if nc == 1 else full
            theirs = ref_decode(path, td, dargs, pgx=use_pgx)
            if theirs is None:
                return False
            if nc == 1 and theirs.ndim == 3:
                theirs = theirs[:, :, 0]
            return psnr(mine, full) >= psnr(theirs, full) - 0.1

        # ours -> reference
        im = gk.Image.from_array(arr.astype(np.int32), prec=depth)
        blob = gk.compress(im, gk.CompressParams(**kw))
        j2k = os.path.join(td, "o.j2k")
        open(j2k, "wb").write(bytes(blob))
        ours_trunc = gk.decompress(
            bytes(blob), gk.DecompressParams(**dkw)
        ).to_array()
        ours_trunc = ours_trunc[:, :, 0] if nc == 1 else ours_trunc
        rimg = ref_decode(j2k, td, dargs, pgx=use_pgx)
        if rimg is not None and nc == 1 and rimg.ndim == 3:
            rimg = rimg[:, :, 0]
        def reduce_quirk(mine, stream_bytes):
            """Attribute a reduced-decode mismatch to the reference when
            OUR output equals the mathematical LL_k (single-tile lossless
            streams only: tiled reduce is a per-tile mosaic)."""
            if "reduce" not in dkw:
                return False
            gt = reduce_ground_truth(arr, depth, stream_bytes,
                                     dkw["reduce"])
            return np.array_equal(mine, gt)

        ok1 = rimg is not None and np.array_equal(rimg, ours_trunc)
        if not ok1 and layer_trunc_quirk(j2k, ours_trunc):
            ok1 = True
        if not ok1 and reduce_quirk(ours_trunc, blob):
            ok1 = True
        if ok1 and lossless_cfg and not dkw:
            ok1 = np.array_equal(ours_trunc, arr)
        # reference -> ours
        j2r = os.path.join(td, "r.j2k")
        r2 = subprocess.run([f"{GRK}/grk_compress", "-i", src, "-o", j2r, *margs],
                            capture_output=True)
        ok2 = True
        if r2.returncode == 0:
            try:
                dec = gk.decompress(open(j2r, "rb").read(),
                                    gk.DecompressParams(**dkw)).to_array()
                dec = dec[:, :, 0] if nc == 1 else dec
                rref = ref_decode(j2r, td, dargs, pgx=use_pgx)
                if rref is not None and nc == 1 and rref.ndim == 3:
                    rref = rref[:, :, 0]
                ok2 = rref is not None and np.array_equal(dec, rref)
                if not ok2 and layer_trunc_quirk(j2r, dec):
                    ok2 = True
                if not ok2 and reduce_quirk(
                        dec, open(j2r, "rb").read()):
                    ok2 = True
            except Exception as e:
                print(f"trial {trial}: OUR DECODER RAISED on the reference "
                      f"stream: {type(e).__name__}: {e}")
                ok2 = False
        if ok1 and ok2:
            continue

        def geometry_self_fails():
            """The reference's tile-parity decode bug is CONTENT- and
            RATE-dependent (a rate-layered encode can truncate exactly the
            deep-level coefficients its decoder mishandles): probe the BARE
            geometry (tiling + resolutions only) with a few contents. If
            the reference cannot roundtrip its own lossless stream there,
            the mismatch on ours is its decoder, not our stream."""
            bare = ["-n", str(nres), *(
                ["-t", f"{kw['tile_size'][0]},{kw['tile_size'][1]}"]
                if "tile_size" in kw else [])]
            for s2 in (1, 2, 3):
                r2_ = np.random.default_rng(s2)
                a2 = r2_.integers(0, 256, arr.shape).astype(np.uint8)
                s2p = os.path.join(td, "alt.png")
                PImage.fromarray(a2).save(s2p)
                if grok_self_ok(s2p, bare, td) is False:
                    return True
                if grok_self_ok(s2p, margs, td) is False:
                    return True
            return False

        # attribution: the reference must pass BOTH its full-decode pixel
        # self-check (a broken encode poisons every comparison, e.g. its
        # degenerate-tile bugs) and the truncated-decode rc check — with
        # content variation, since its decode bugs are data-dependent
        if (grok_self_ok(src, margs, td) is False
                or (dargs and grok_self_ok(src, margs, td, dargs) is False)
                or geometry_self_fails()):
            ref_bug += 1
            print(f"trial {trial}: reference fails its OWN stream "
                  f"(tile={kw.get('tile_size')}, mode={mode:#x}) — not our bug")
        else:
            ours_fail += 1
            print(f"OUR FAILURE trial {trial}: h={h} w={w} nc={nc} nres={nres} "
                  f"mode={mode:#x} prog={prog} tile={kw.get('tile_size')} "
                  f"layers={nlayers} plt={kw.get('write_plt', False)} "
                  f"dargs={dargs} ours->ref={ok1} ref->ours={ok2}")
    print(f"interop fuzz: {trials} configs, {ours_fail} our failures, "
          f"{ref_bug} reference-decoder bugs")
    return 1 if ours_fail else 0


if __name__ == "__main__":
    sys.exit(main())
