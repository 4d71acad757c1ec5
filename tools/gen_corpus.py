#!/usr/bin/env python3
"""Golden-corpus generator.

Encodes deterministic inputs with the REFERENCE encoder (grk_compress)
across the feature matrix, records the MD5 of the reference decoder's own
pixel output in tests/corpus/manifest.json, and verifies our decoder
reproduces it before accepting the entry (the corpus is self-contained:
CI needs no reference binaries). Existing manifest entries are kept;
only missing names are generated.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/gen_corpus.py
"""

import glob
import json
import os
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
CORPUS = os.path.join(REPO, "tests", "corpus")
GRK = "/tmp/grok-build/bin"

from tests.conftest import golden_md5, read_pgx  # noqa: E402

# (name, input spec, encode args, decode params, tolerance)
# input spec: ("rgb8"|"gray8"|"gray16", h, w)
NEW = [
    ("psnr_layers.j2k", ("rgb8", 140, 180), ["-q", "32,38,44"], None, 0),
    ("tp_divider_R.j2k", ("rgb8", 140, 180),
     ["-u", "R", "-t", "100,100", "-n", "4"], None, 0),
    ("tp_divider_C.j2k", ("rgb8", 140, 180), ["-u", "C"], None, 0),
    ("gray16.j2k", ("gray16", 120, 150), [], None, 0),
    ("gray16_tiles.j2k", ("gray16", 120, 150), ["-t", "64,64", "-M", "1"],
     None, 0),
    ("cblk_128x32.j2k", ("rgb8", 140, 180), ["-b", "128,32"], None, 0),
    ("single_res.j2k", ("rgb8", 140, 180), ["-n", "1"], None, 0),
    # (multi-tile POC: the reference encoder rejects -P with more than one
    # tile, "Failed to initialize POC" — single-tile POC goldens exist)
    ("offset_tiles.j2k", ("rgb8", 140, 180),
     ["-d", "10,6", "-t", "64,64"], None, 0),
    ("ht_layers_tiles.j2k", ("rgb8", 140, 180),
     ["-M", "64", "-t", "96,96", "-L"], None, 0),
    # JP2 container goldens (box parsing exercised against reference pixels)
    ("rgb8_container.jp2", ("rgb8", 140, 180), [], None, 0),
    ("gray16_container.jp2", ("gray16", 120, 150), [], None, 0),
    # the fuzz-found T2 rate-monotonicity class: 16-bit BYPASS + layers
    ("gray16_bypass_layers.j2k", ("gray16", 150, 200),
     ["-M", "1", "-r", "4,1", "-L", "-c", "[128,128]", "-n", "4"], None, 0),
    ("gray16_bypass_layers_l1.j2k", ("gray16", 150, 200),
     ["-M", "1", "-r", "4,1", "-L", "-c", "[128,128]", "-n", "4"],
     {"max_layers": 1}, 0),
    # 4-component (CMYK TIFF input; no MCT on 4 comps)
    ("cmyk8.j2k", ("cmyk8", 120, 160), [], None, 0),
    ("cmyk8_tiles.j2k", ("cmyk8", 120, 160), ["-t", "64,64"], None, 0),
    # ---- round-3 breadth expansion (reference ships 350 MD5 refs;
    # tests/nonregression/md5refs.txt): progression x tiles x layers,
    # HT matrix, 9/7 matrix, geometry extremes, codeblock extremes,
    # per-resolution precincts, mode-switch combos, deep layer stacks,
    # POC, containers, arbitrary PNM depths.
    ("rpcl_tiles.j2k", ("rgb8", 140, 180), ["-p", "RPCL", "-t", "64,64"],
     None, 0),
    ("pcrl_tiles_layers.j2k", ("rgb8", 140, 180),
     ["-p", "PCRL", "-t", "96,96", "-r", "20,5"], None, 0),
    ("cprl_tiny_tiles.j2k", ("gray8", 96, 120), ["-p", "CPRL", "-t", "16,16"],
     None, 0),
    ("rlcp_offset_tiles.j2k", ("rgb8", 140, 180),
     ["-p", "RLCP", "-d", "3,5", "-t", "48,56"], None, 0),
    ("ht_rpcl_prec.j2k", ("rgb8", 140, 180),
     ["-M", "64", "-p", "RPCL", "-c", "[64,64]"], None, 0),
    ("ht_rates.j2k", ("rgb8", 140, 180), ["-M", "64", "-r", "20,5"], None, 0),
    ("ht_gray16.j2k", ("gray16", 120, 150), ["-M", "64"], None, 0),
    ("ht_sop_eph.j2k", ("rgb8", 140, 180), ["-M", "64", "-S", "-E"], None, 0),
    ("ht_cblk32x128.j2k", ("rgb8", 140, 180), ["-M", "64", "-b", "32,128"],
     None, 0),
    ("ht_psnr.j2k", ("rgb8", 140, 180), ["-M", "64", "-q", "34,40"], None, 0),
    # (ht_tiles_16bit_plt / container_ht_tiles / tlm_tiles_many dropped:
    # the reference DECODER garbles its own tiled HT/TLM streams — our
    # decode is bit-perfect vs the source; see docs/STATUS.md "Reference
    # bugs found". tp_divider_L / odd_offset_tiles dropped: reference
    # odd-origin + L-divider classes, ours round-trips exactly.)
    ("lossy97_rates.j2k", ("rgb8", 140, 180), ["-I", "-r", "50,10"], None, 4),
    ("lossy97_tiles.j2k", ("rgb8", 140, 180), ["-I", "-t", "64,64"], None, 1),
    ("lossy97_tiles_l1.j2k", ("rgb8", 140, 180),
     ["-I", "-t", "64,64", "-r", "40,8"], {"max_layers": 1}, 1),
    ("lossy97_psnr.j2k", ("rgb8", 140, 180), ["-I", "-q", "32,38"], None, 4),
    ("lossy97_gray16.j2k", ("gray16", 120, 150), ["-I"], None, 1),
    ("lossy97_reduce2.j2k", ("rgb8", 160, 200), ["-I", "-n", "5"],
     {"reduce": 2}, 1),
    ("lossy97_ht.j2k", ("rgb8", 140, 180), ["-I", "-M", "64"], None, 1),
    ("tiny_5x3.j2k", ("gray8", 5, 3), [], None, 0),
    ("row_1x200.j2k", ("gray8", 1, 200), [], None, 0),
    ("col_200x1.j2k", ("gray8", 200, 1), [], None, 0),
    ("cblk_4x4.j2k", ("gray8", 64, 80), ["-b", "4,4"], None, 0),
    ("cblk_1024x4.j2k", ("rgb8", 140, 180), ["-b", "1024,4"], None, 0),
    ("cblk_4x1024.j2k", ("rgb8", 140, 180), ["-b", "4,1024"], None, 0),
    ("prec_per_res.j2k", ("rgb8", 140, 180),
     ["-c", "[64,64],[32,32],[16,16]"], None, 0),
    ("prec_asym.j2k", ("rgb8", 140, 180), ["-c", "[128,16]"], None, 0),
    ("mode_bypass_reset.j2k", ("rgb8", 140, 180), ["-M", "3"], None, 0),
    ("mode_reset_termall.j2k", ("rgb8", 140, 180), ["-M", "6"], None, 0),
    ("mode_pterm_segsym.j2k", ("rgb8", 140, 180), ["-M", "48"], None, 0),
    ("layers6.j2k", ("rgb8", 140, 180), ["-r", "80,40,20,10,5,1"], None, 0),
    ("layers6_l3.j2k", ("rgb8", 140, 180), ["-r", "80,40,20,10,5,1"],
     {"max_layers": 3}, 0),
    ("psnr4_l2.j2k", ("rgb8", 140, 180), ["-q", "30,35,40,45"],
     {"max_layers": 2}, 0),
    ("poc_two_seg.j2k", ("rgb8", 140, 180),
     ["-n", "4", "-P", "T0=0,0,1,4,3,RLCP/T0=0,0,4,4,3,CPRL"], None, 0),
    ("container_lossy97.jp2", ("rgb8", 140, 180), ["-I"], None, 1),
    ("container_cmyk.jp2", ("cmyk8", 120, 160), [], None, 0),
    ("gray4.j2k", ("gray4", 80, 100), [], None, 0),
    ("gray2.j2k", ("gray2", 80, 100), [], None, 0),
    ("gray12.j2k", ("gray12", 120, 150), [], None, 0),
    ("gray12_ht.j2k", ("gray12", 120, 150), ["-M", "64"], None, 0),
    ("gray12_tiles_layers.j2k", ("gray12", 120, 150),
     ["-t", "64,64", "-r", "10,2"], None, 0),
    ("gray14_bypass.j2k", ("gray14", 120, 150), ["-M", "1"], None, 0),
    ("tlm_ht_rpcl.j2k", ("rgb8", 160, 200),
     ["-L", "-M", "64", "-p", "RPCL", "-t", "80,80"], None, 0),
    ("res7.j2k", ("rgb8", 200, 260), ["-n", "7"], None, 0),
    ("res7_reduce3.j2k", ("rgb8", 200, 260), ["-n", "7"], {"reduce": 3}, 0),
    ("sop_eph_tiles_layers.j2k", ("rgb8", 140, 180),
     ["-S", "-E", "-t", "64,64", "-r", "20,5"], None, 0),
    ("bypass_ht_mix_gray.j2k", ("gray8", 96, 120), ["-M", "65"], None, 0),
    ("big_offset.j2k", ("gray8", 100, 120), ["-d", "90,70"], None, 0),
    ("guard3.j2k", ("gray8", 96, 120), ["-N", "3"], None, 0),
    ("ycc_off.j2k", ("rgb8", 140, 180), ["-Y", "0"], None, 0),
]


def make_input(spec, td):
    kind, h, w = spec
    import zlib

    r = np.random.default_rng(zlib.crc32(kind.encode()) + h + w)
    yy, xx = np.mgrid[0:h, 0:w]
    base = 0.5 + 0.3 * np.sin(xx / 17) * np.cos(yy / 23)
    if kind == "rgb8":
        from PIL import Image

        g = (np.clip(base + r.standard_normal((h, w)) * 0.05, 0, 1) * 255)
        arr = np.stack([g, np.roll(g, 3, 0), np.roll(g, 5, 1)],
                       -1).astype(np.uint8)
        p = os.path.join(td, "in.png")
        Image.fromarray(arr).save(p)
        return p, 3
    if kind == "cmyk8":
        from PIL import Image

        g = (np.clip(base + r.standard_normal((h, w)) * 0.05, 0, 1) * 255)
        arr = np.stack([g, np.roll(g, 3, 0), np.roll(g, 5, 1),
                        np.roll(g, 7, 0)], -1).astype(np.uint8)
        p = os.path.join(td, "in.tif")
        Image.fromarray(arr, mode="CMYK").save(p)
        return p, 4
    depth = int(kind[4:]) if kind.startswith("gray") and kind[4:] else 8
    mx = (1 << depth) - 1
    g = (np.clip(base + r.standard_normal((h, w)) * 0.05, 0, 1) * mx)
    arr = g.astype(">u2" if depth > 8 else "u1")
    p = os.path.join(td, "in.pgm")
    with open(p, "wb") as f:
        f.write(f"P5\n{w} {h}\n{mx}\n".encode())
        f.write(arr.tobytes())
    return p, 1


def ref_decode(j2k, td, ncomps, decode_kwargs=None):
    """Reference decode -> (md5, [component arrays]) or None."""
    dargs = []
    for k, v in (decode_kwargs or {}).items():
        dargs += {"max_layers": ["-l", str(v)],
                  "reduce": ["-r", str(v)]}[k]
    for f in glob.glob(os.path.join(td, "dec*.pgx")):
        os.unlink(f)
    out = os.path.join(td, "dec.pgx")
    r = subprocess.run([f"{GRK}/grk_decompress", "-i", j2k, "-o", out,
                        *dargs], capture_output=True)
    if r.returncode:
        return None
    files = sorted(glob.glob(os.path.join(td, "dec*.pgx")))
    if len(files) != ncomps:
        return None
    arrs = [read_pgx(f) for f in files]
    return golden_md5(arrs), arrs


def ours_decode(data, decode_kwargs):
    import grok_tpu as gk

    img = gk.decompress(data, gk.DecompressParams(**(decode_kwargs or {})))
    arrs = [c.data for c in img.components]
    return golden_md5(arrs), arrs


def main():
    manifest = json.load(open(os.path.join(CORPUS, "manifest.json")))
    have = {e["name"] for e in manifest}
    added = 0
    with tempfile.TemporaryDirectory() as td:
        for name, spec, args, dec, tol in NEW:
            if name in have:
                continue
            src, ncomps = make_input(spec, td)
            j2k = os.path.join(td, name)
            r = subprocess.run([f"{GRK}/grk_compress", "-i", src, "-o", j2k,
                                *args], capture_output=True)
            if r.returncode:
                print(f"SKIP {name}: reference cannot encode "
                      f"({r.stderr.decode()[-120:]})")
                continue
            got = ref_decode(j2k, td, ncomps, dec)
            if got is None:
                print(f"SKIP {name}: reference cannot decode its own stream")
                continue
            md5, ref_arrs = got
            data = open(j2k, "rb").read()
            try:
                ours, our_arrs = ours_decode(data, dec)
            except Exception as e:
                print(f"FAIL {name}: our decode raised {e!r}")
                continue
            entry = {"name": name, "md5": md5, "ncomps": len(our_arrs),
                     "args": args}
            if dec:
                entry["decode"] = dec
            if ours != md5:
                # irreversible float class: accept within the stated
                # tolerance and store the reference pixels for the test's
                # pixel-compare path (test_conformance.py "pixels" branch)
                ok = tol and len(our_arrs) == len(ref_arrs) and all(
                    a.shape == b.shape and
                    np.abs(a.astype(np.int64) - b.astype(np.int64)).max()
                    <= tol for a, b in zip(our_arrs, ref_arrs))
                if not ok:
                    print(f"FAIL {name}: our decode != reference decode")
                    continue
                pix = name + ".pixels.npz"
                np.savez_compressed(
                    os.path.join(CORPUS, "streams", pix),
                    **{f"arr_{i}": a for i, a in enumerate(ref_arrs)})
                entry["pixels"] = pix
                entry["tolerance"] = tol
            with open(os.path.join(CORPUS, "streams", name), "wb") as f:
                f.write(data)
            manifest.append(entry)
            added += 1
            print(f"ADD  {name} ({len(data)} B, md5 {md5[:8]}"
                  + (", tol pixels" if "pixels" in entry else "") + ")")
    with open(os.path.join(CORPUS, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
        f.write("\n")
    print(f"{added} entries added, {len(manifest)} total")


if __name__ == "__main__":
    main()
