"""PCRD-opt rate control (Taubman; T.800 informative Annex J.10).

Parity target: tile/TileProcessor.cpp rateAllocate/pcrdBisectFeasible +
t2/RateControl.cpp convexHull — re-derived.

Inputs are the batched T1 outputs: per-block cumulative pass rates [N, P]
and per-pass distortion decreases [N, P] (coefficient-domain squared error,
already weighted by step^2 * band-synthesis-norm^2 by the caller). The
convex-hull + slope-threshold search is fully vectorized across blocks.
"""

from __future__ import annotations

import numpy as np


def hull_effective_slopes(rates: np.ndarray, dists: np.ndarray, npasses: np.ndarray):
    """Per-pass effective R-D slope after convex-hull pruning.

    Returns slopes [N, P]: for each pass, the slope of the hull segment that
    covers it (non-increasing along each row); 0 beyond npasses. Including
    "all passes with eff_slope >= lambda" yields exactly the hull-feasible
    truncation for threshold lambda.
    """
    n, pmax = rates.shape
    import os

    if os.environ.get("GROK_TPU_NATIVE_OPS", "1") != "0":
        from ..t1.native import get_lib

        lib = get_lib()
        if lib is not None and hasattr(lib, "hull_slopes"):
            slopes = np.zeros((n, pmax), dtype=np.float64)
            lib.hull_slopes(
                np.ascontiguousarray(rates, dtype=np.int64),
                np.ascontiguousarray(dists, dtype=np.float64),
                np.ascontiguousarray(npasses, dtype=np.int32),
                n, pmax, slopes, 0,
            )
            return slopes
    slopes = np.zeros((n, pmax), dtype=np.float64)
    for i in range(n):
        np_i = int(npasses[i])
        if np_i == 0:
            continue
        r = rates[i, :np_i].astype(np.float64)
        d_cum = np.cumsum(dists[i, :np_i])

        def R(j):
            return r[j] if j >= 0 else 0.0

        def D(j):
            return d_cum[j] if j >= 0 else 0.0

        hull: list[int] = []
        for k in range(np_i):
            if d_cum[k] <= D(hull[-1] if hull else -1):
                continue  # adds no distortion reduction: never a vertex
            while hull:
                prev = hull[-2] if len(hull) >= 2 else -1
                s_top = (D(hull[-1]) - D(prev)) / max(R(hull[-1]) - R(prev), 1e-9)
                s_new = (d_cum[k] - D(prev)) / max(r[k] - R(prev), 1e-9)
                if s_new >= s_top:
                    hull.pop()
                else:
                    break
            hull.append(k)

        prev_idx = -1
        r0 = d0 = 0.0
        for h in hull:
            seg_slope = (d_cum[h] - d0) / max(r[h] - r0, 1e-9)
            slopes[i, prev_idx + 1 : h + 1] = seg_slope
            r0, d0 = r[h], d_cum[h]
            prev_idx = h
        # passes after the last vertex keep slope 0 (never included)
    return slopes


def passes_for_threshold(slopes: np.ndarray, lam: float) -> np.ndarray:
    """Number of included passes per block for slope threshold lam."""
    return (slopes >= lam).sum(axis=1)


def dist_for_threshold(dists: np.ndarray, slopes: np.ndarray, lam: float) -> float:
    """Total distortion reduction captured by the passes above threshold."""
    return float(np.where(slopes >= lam, dists, 0.0).sum())


def rate_for_threshold(rates: np.ndarray, slopes: np.ndarray, lam: float) -> float:
    k = passes_for_threshold(slopes, lam)
    idx = np.maximum(k - 1, 0)
    r = np.take_along_axis(rates, idx[:, None], axis=1)[:, 0]
    return float(np.where(k > 0, r, 0).sum())


def allocate_layers(
    rates: np.ndarray,
    dists: np.ndarray,
    npasses: np.ndarray,
    layer_targets: list[float | None],
    header_overhead_fn=None,
    exact_rate_fn=None,
    dist_targets: list[float | None] | None = None,
    lam_out: list | None = None,
) -> np.ndarray:
    """Compute per-block cumulative pass counts per layer.

    layer_targets: cumulative byte budgets per layer (None = include all).
    header_overhead_fn(cum_passes [N]) -> estimated packet-header bytes
    (heuristic path). exact_rate_fn(cum_rows list of [N]) -> exact
    cumulative stream bytes via full packet simulation (reference parity:
    compressPacketsSimulate) — used instead of the heuristic when given.
    dist_targets: per-layer residual-distortion ceilings (fixed-quality /
    PSNR layers); a layer may carry either a rate or a distortion target.
    lam_out: when a list is passed, the accepted slope threshold of each
    layer is appended (0.0 for take-everything layers, inf when nothing
    beyond the previous layer fit) — the plane-skip safety check in
    tile_processor needs the final lambda.
    Returns [L, N] cumulative pass counts (non-decreasing across layers).
    """
    n, pmax = rates.shape
    slopes = hull_effective_slopes(rates, dists, npasses)
    pos = slopes[slopes > 0]
    lo = float(pos.min()) if pos.size else 0.0
    hi = float(pos.max()) if pos.size else 1.0
    total_d = float(dists.sum())

    out = np.zeros((len(layer_targets), n), dtype=np.int64)
    prev = np.zeros(n, dtype=np.int64)
    prev_rows: list[np.ndarray] = []
    for li, target in enumerate(layer_targets):
        dtarget = dist_targets[li] if dist_targets else None
        lam_used = 0.0
        if target is None and dtarget is None:
            k = npasses.astype(np.int64)
        elif dtarget is not None:
            # fixed quality: smallest pass set with residual distortion
            # below the ceiling (largest feasible slope threshold)
            a = max(lo * 0.5, 1e-12)
            b = hi * 2.0 + 1.0
            for _ in range(64):
                mid = (a * b) ** 0.5
                if total_d - dist_for_threshold(dists, slopes, mid) <= dtarget:
                    a = mid
                else:
                    b = mid
            k = passes_for_threshold(slopes, a)
            lam_used = a
        elif exact_rate_fn is not None:
            # hybrid: narrow with the cheap body-rate bisection, then find
            # the exact threshold with a bracketed geometric bisection on
            # full packet simulations (reference pcrdBisectSimple parity;
            # a fixed multiplicative ladder can jump over rate cliffs when
            # hull slopes cluster, e.g. many small codeblocks)
            a = max(lo * 0.5, 1e-12)
            b = hi * 2.0 + 1.0
            for _ in range(48):
                mid = (a * b) ** 0.5
                if rate_for_threshold(rates, slopes, mid) <= target * 0.99:
                    b = mid
                else:
                    a = mid
            lam = b
            k_b = np.maximum(passes_for_threshold(slopes, lam), prev)
            sims = 0
            lam_feas = lam_inf = None
            best_val = None
            v0 = exact_rate_fn(prev_rows + [k_b])
            if v0 <= target:
                lam_feas = lam
                best_val = v0
                # loosen to bracket: find an infeasible lower threshold
                cand = lam
                while sims < 4 and cand > lo * 0.5:
                    cand /= 1.6
                    k_c = np.maximum(passes_for_threshold(slopes, cand), prev)
                    sims += 1
                    vc = exact_rate_fn(prev_rows + [k_c])
                    if vc <= target:
                        lam_feas = cand
                        k_b = k_c
                        best_val = vc
                    else:
                        lam_inf = cand
                        break
            else:
                lam_inf = lam
                while sims < 12:
                    lam *= 1.6
                    k_c = np.maximum(passes_for_threshold(slopes, lam), prev)
                    sims += 1
                    vc = exact_rate_fn(prev_rows + [k_c])
                    if vc <= target:
                        lam_feas = lam
                        k_b = k_c
                        best_val = vc
                        break
                    lam_inf = lam
                if lam_feas is None:
                    k_b = prev.copy()  # nothing beyond earlier layers fits
            if lam_feas is not None and lam_inf is not None:
                # invariant: lam_inf < lam_feas (higher threshold = fewer
                # passes = feasible side)
                for _ in range(64):
                    # stop when within 1% of budget (or 64 bytes), the
                    # bracket has collapsed, or the sim budget is spent
                    close = best_val is not None and (
                        target - best_val <= max(64.0, 0.01 * target)
                    )
                    if close or lam_feas / lam_inf < 1.0000001 or sims >= 16:
                        break
                    mid = (lam_feas * lam_inf) ** 0.5
                    k_c = np.maximum(passes_for_threshold(slopes, mid), prev)
                    if (k_c == k_b).all():
                        lam_feas = mid  # same allocation: shrink, no sim
                        continue
                    sims += 1
                    vc = exact_rate_fn(prev_rows + [k_c])
                    if vc <= target:
                        lam_feas = mid
                        k_b = k_c
                        best_val = vc
                    else:
                        lam_inf = mid
            k = k_b
            lam_used = lam_feas if lam_feas is not None else float("inf")
        else:
            overhead = header_overhead_fn(prev) if header_overhead_fn else 0.0
            budget = max(target * 0.998 - overhead, 0.0)
            a, b = lo * 0.5, hi * 2.0 + 1.0
            # bisect: find smallest lambda with rate <= budget... rate is
            # non-increasing in lambda, so search for the threshold
            for _ in range(64):
                mid = 0.5 * (a + b)
                if rate_for_threshold(rates, slopes, mid) <= budget:
                    b = mid
                else:
                    a = mid
            k = passes_for_threshold(slopes, b)
            lam_used = b
        if lam_out is not None:
            lam_out.append(lam_used)
        k = np.maximum(k, prev)
        out[li] = k
        prev = k
        prev_rows.append(k)
    return out
