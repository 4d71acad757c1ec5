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


def grok_self_ok(src, args, td):
    """Does the reference roundtrip its OWN stream for this config?"""
    j = os.path.join(td, "self.j2k")
    o = os.path.join(td, "self.png")
    if subprocess.run([f"{GRK}/grk_compress", "-i", src, "-o", j, *args],
                      capture_output=True).returncode:
        return None  # reference cannot encode this config at all
    if subprocess.run([f"{GRK}/grk_decompress", "-i", j, "-o", o],
                      capture_output=True).returncode:
        return False
    a = np.asarray(PImage.open(src).convert("RGB"))
    b = np.asarray(PImage.open(o).convert("RGB"))
    return np.array_equal(a, b)


def main():
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    rng = np.random.default_rng(seed)
    td = tempfile.mkdtemp()
    ours_fail = ref_bug = 0
    for trial in range(trials):
        h = int(rng.integers(40, 400))
        w = int(rng.integers(40, 400))
        nc = int(rng.choice([1, 3]))
        arr = rng.integers(0, 256, (h, w, nc) if nc == 3 else (h, w)).astype(np.uint8)
        src = os.path.join(td, "s.png")
        PImage.fromarray(arr).save(src)
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
        margs = ["-n", str(nres), "-p", prog, "-M", str(mode if mode != 64 else 64),
                 *targs]
        # ours -> reference
        im = gk.Image.from_array(arr.astype(np.int32))
        blob = gk.compress(im, gk.CompressParams(**kw))
        j2k = os.path.join(td, "o.j2k")
        open(j2k, "wb").write(bytes(blob))
        out = os.path.join(td, "o.png")
        r = subprocess.run([f"{GRK}/grk_decompress", "-i", j2k, "-o", out],
                           capture_output=True)
        ok1 = r.returncode == 0 and np.array_equal(np.asarray(PImage.open(out)), arr)
        # reference -> ours
        j2r = os.path.join(td, "r.j2k")
        r2 = subprocess.run([f"{GRK}/grk_compress", "-i", src, "-o", j2r, *margs],
                            capture_output=True)
        ok2 = True
        if r2.returncode == 0:
            dec = gk.decompress(open(j2r, "rb").read()).to_array()
            ok2 = np.array_equal(dec[:, :, 0] if nc == 1 else dec, arr)
        if ok1 and ok2:
            continue
        if grok_self_ok(src, margs, td) is False:
            ref_bug += 1
            print(f"trial {trial}: reference fails its OWN stream "
                  f"(tile={kw.get('tile_size')}, mode={mode:#x}) — not our bug")
        else:
            ours_fail += 1
            print(f"OUR FAILURE trial {trial}: h={h} w={w} nc={nc} nres={nres} "
                  f"mode={mode:#x} prog={prog} tile={kw.get('tile_size')} "
                  f"ours->ref={ok1} ref->ours={ok2}")
    print(f"interop fuzz: {trials} configs, {ours_fail} our failures, "
          f"{ref_bug} reference-decoder bugs")
    return 1 if ours_fail else 0


if __name__ == "__main__":
    sys.exit(main())
