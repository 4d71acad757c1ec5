"""Dump-diff utility (parity target: /root/reference/tests/compare_dump_files.cpp).

Parses a codec-state dump — either our `grok_tpu.cli.dump` output or the
reference's `grk_dump` output — into one normalized fact set, and diffs two
of them semantically. Exit 0 = same facts, 1 = differences (printed).

Usage:
    python tools/compare_dumps.py -b ref_dump.txt -t our_dump.txt
"""

import argparse
import re
import sys


def parse_dump(text: str) -> dict:
    """Extract the normalized facts both dump formats report."""
    f: dict = {"comps": {}, "coding": {}, "markers": []}

    # image geometry
    m = re.search(r"x0=(\d+), y0=(\d+)\n\s*x1=(\d+), y1=(\d+)", text)
    if m:  # reference format
        f["image"] = tuple(int(v) for v in m.groups())
    m = re.search(r"image: \[(\d+),(\d+)\) - \[(\d+),(\d+)\)", text)
    if m:  # ours: [x0,y0) - [x1,y1)
        x0, y0, x1, y1 = (int(v) for v in m.groups())
        f["image"] = (x0, y0, x1, y1)

    m = re.search(r"numcomps=(\d+)", text) or re.search(
        r"components: (\d+)", text)
    if m:
        f["numcomps"] = int(m.group(1))

    # tile grid
    m = re.search(r"tx0=(\d+), ty0=(\d+)\n\s*tdx=(\d+), tdy=(\d+)\n"
                  r"\s*tw=(\d+), th=(\d+)", text)
    if m:
        tx0, ty0, tdx, tdy, tw, th = (int(v) for v in m.groups())
        f["tiles"] = (tw, th, tdx, tdy, tx0, ty0)
    m = re.search(r"tiles: (\d+) x (\d+) of (\d+)x(\d+) @ \((\d+),(\d+)\)", text)
    if m:
        tw, th, tdx, tdy, tx0, ty0 = (int(v) for v in m.groups())
        f["tiles"] = (tw, th, tdx, tdy, tx0, ty0)

    # per-component SIZ facts
    for m in re.finditer(
            r"component (\d+) \{\s*\n\s*dx=(\d+), dy=(\d+)\s*\n"
            r"\s*prec=(\d+)\s*\n\s*sgnd=(\d+)", text):
        i, dx, dy, prec, sgnd = (int(v) for v in m.groups())
        f["comps"][i] = (dx, dy, prec, bool(sgnd))
    for m in re.finditer(
            r"\[(\d+)\] prec=(\d+) signed=(\w+) dx=(\d+) dy=(\d+)", text):
        i, prec, sgnd, dx, dy = m.groups()
        f["comps"][int(i)] = (int(dx), int(dy), int(prec), sgnd == "True")

    # default-tile scalar facts
    for key, pats in {
        "prg": [r"\bprg=(\d+)"],
        "numlayers": [r"numlayers=(\d+)"],
        "mct": [r"\bmct=(\d+)"],
    }.items():
        for pat in pats:
            m = re.search(pat, text)
            if m:
                f[key] = int(m.group(1))
                break

    # per-component coding params (default tile): both formats emit
    # 'comp N {' blocks with the same key=value fields
    for m in re.finditer(r"comp (\d+) \{([^}]*)\}", text):
        ci = int(m.group(1))
        body = m.group(2)
        if "numresolutions" not in body:
            continue  # SIZ component block, not a coding block
        c: dict = {}
        for key in ("csty", "numresolutions", "cblksty", "qmfbid",
                    "qntsty", "numgbits", "roishift"):
            mm = re.search(rf"{key}=(?:0x)?([0-9a-fA-F]+)", body)
            if mm:
                base = 16 if f"{key}=0x" in body else 10
                c[key] = int(mm.group(1), base)
        mm = re.search(r"cblkw=2\^(\d+)", body)
        if mm:
            c["cblkw"] = int(mm.group(1))
        mm = re.search(r"cblkh=2\^(\d+)", body)
        if mm:
            c["cblkh"] = int(mm.group(1))
        mm = re.search(r"prec\w*s? \(w,h\)=((?:\(\d+,\d+\)\s*)+)", body)
        if mm:
            c["precincts"] = re.findall(r"\((\d+),(\d+)\)", mm.group(1))
        mm = re.search(r"stepsizes \(m,e\)=((?:\(\d+,\d+\)\s*)+)", body)
        if mm:
            c["stepsizes"] = re.findall(r"\((\d+),(\d+)\)", mm.group(1))
        f["coding"][ci] = c

    # marker index (type, pos, len)
    for m in re.finditer(r"type=0x([0-9a-fA-F]+), pos=(\d+), len=(\d+)", text):
        f["markers"].append(
            (int(m.group(1), 16), int(m.group(2)), int(m.group(3))))
    return f


def diff(base: dict, test: dict, prefix="") -> list[str]:
    out = []
    keys = sorted(set(base) | set(test), key=str)
    for k in keys:
        b, t = base.get(k), test.get(k)
        if isinstance(b, dict) and isinstance(t, dict):
            out += diff(b, t, prefix=f"{prefix}{k}.")
        elif b != t:
            out.append(f"{prefix}{k}: base={b!r} test={t!r}")
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("-b", "--base", required=True, help="reference dump file")
    ap.add_argument("-t", "--test", required=True, help="dump under test")
    ap.add_argument("-q", "--quiet", action="store_true")
    a = ap.parse_args(argv)
    base = parse_dump(open(a.base, encoding="utf-8", errors="replace").read())
    test = parse_dump(open(a.test, encoding="utf-8", errors="replace").read())
    # only compare facts present in BOTH dumps' vocabulary: drop keys one
    # side doesn't report at all (e.g. empty marker list)
    for k in list(base):
        if k not in test or (not base[k] and not test.get(k)):
            pass
    d = diff(base, test)
    if d:
        for line in d:
            print(line)
        return 1
    if not a.quiet:
        print(f"dumps agree on {len(base['comps'])} comps, "
              f"{len(base['coding'])} coding blocks, "
              f"{len(base['markers'])} markers")
    return 0


if __name__ == "__main__":
    sys.exit(main())
