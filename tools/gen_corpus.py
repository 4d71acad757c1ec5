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
    depth = 16 if kind == "gray16" else 8
    mx = (1 << depth) - 1
    g = (np.clip(base + r.standard_normal((h, w)) * 0.05, 0, 1) * mx)
    arr = g.astype(">u2" if depth > 8 else "u1")
    p = os.path.join(td, "in.pgm")
    with open(p, "wb") as f:
        f.write(f"P5\n{w} {h}\n{mx}\n".encode())
        f.write(arr.tobytes())
    return p, 1


def ref_decode_md5(j2k, td, ncomps, decode_kwargs=None):
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
    return golden_md5([read_pgx(f) for f in files])


def ours_md5(data, decode_kwargs):
    import grok_tpu as gk

    img = gk.decompress(data, gk.DecompressParams(**(decode_kwargs or {})))
    return golden_md5([c.data for c in img.components]), len(img.components)


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
            md5 = ref_decode_md5(j2k, td, ncomps, dec)
            if md5 is None:
                print(f"SKIP {name}: reference cannot decode its own stream")
                continue
            data = open(j2k, "rb").read()
            try:
                ours, nc = ours_md5(data, dec)
            except Exception as e:
                print(f"FAIL {name}: our decode raised {e!r}")
                continue
            if ours != md5:
                print(f"FAIL {name}: our decode != reference decode")
                continue
            with open(os.path.join(CORPUS, "streams", name), "wb") as f:
                f.write(data)
            entry = {"name": name, "md5": md5, "ncomps": nc, "args": args}
            if dec:
                entry["decode"] = dec
            if tol:
                entry["tolerance"] = tol
            manifest.append(entry)
            added += 1
            print(f"ADD  {name} ({len(data)} B, md5 {md5[:8]})")
    with open(os.path.join(CORPUS, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
        f.write("\n")
    print(f"{added} entries added, {len(manifest)} total")


if __name__ == "__main__":
    main()
