"""Multi-device scaling-efficiency harness (BASELINE: >=80% efficiency
1 chip -> 1 host -> N hosts; SURVEY §7 stage 10).

Runs the distributed tile-sharded encode (parallel/distributed.py) over
meshes of 1, 2, 4, ... devices on the available backend and reports wall
time, throughput, and scaling efficiency T1 / (n * Tn) per mesh size as
one JSON line per configuration, plus a summary line.

On real TPU slices the device count is the chip count and efficiency
measures ICI scaling of the transform chain + host assembly overlap. On
this CPU image, set

    JAX_PLATFORM_NAME=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8

to exercise the full sharded path on a virtual mesh; the efficiency
numbers then saturate at the physical core count (the virtual devices
share cores), so they validate the machinery, not the silicon.

Usage: python tools/scaling_bench.py [H W tile devices...]
       (defaults: 2048 2048 512 — 16 tiles — over 1,2,4,8 devices)
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import grok_tpu as gk  # noqa: E402
from grok_tpu.parallel.distributed import _make_mesh, compress_distributed  # noqa: E402


def natural_image(h, w, nc=3, seed=3):
    r = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = 0.5 + 0.3 * np.sin(xx / 23) * np.cos(yy / 31)
    g = (np.clip(base + r.standard_normal((h, w)) * 0.02, 0, 1) * 255)
    g = g.astype(np.int32)
    return np.stack([g] * nc, -1) if nc > 1 else g


def main(argv):
    import jax

    H = int(argv[1]) if len(argv) > 1 else 2048
    W = int(argv[2]) if len(argv) > 2 else 2048
    T = int(argv[3]) if len(argv) > 3 else 512
    avail = len(jax.devices())
    sizes = [int(x) for x in argv[4:]] or [
        n for n in (1, 2, 4, 8, 16) if n <= avail
    ]
    arr = natural_image(H, W)
    params = gk.CompressParams(num_resolutions=5, tile_size=(T, T),
                               write_tlm=True)
    ref = gk.compress(gk.Image.from_array(arr), params)
    mp = H * W / 1e6
    t1 = None
    rows = []
    for n in sizes:
        mesh = _make_mesh(n)
        # warm (compile) then best-of-3
        compress_distributed(gk.Image.from_array(arr), params, mesh=mesh)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = compress_distributed(gk.Image.from_array(arr), params,
                                       mesh=mesh)
            best = min(best, time.perf_counter() - t0)
        assert out == ref, f"divergence at n={n}"
        if t1 is None:
            t1 = best
        eff = t1 / (n * best)
        row = {"devices": n, "seconds": round(best, 4),
               "mps": round(mp / best, 2), "efficiency": round(eff, 3),
               "byte_identical": True}
        rows.append(row)
        print(json.dumps(row))
    print(json.dumps({
        "metric": "tile_sharded_encode_scaling",
        "image": f"{W}x{H} tiles {T}x{T}",
        "backend": jax.devices()[0].platform,
        "rows": rows,
    }))


if __name__ == "__main__":
    main(sys.argv)
