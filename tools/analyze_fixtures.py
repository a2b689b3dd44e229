"""Profile reference fixtures for device-decode planning.

For each stream: metablock count/kinds, tree counts, block types, and the
copy-distance profile (how many copy BYTES come from beyond a candidate
VMEM ring) — the facts that decide the v3 far-history design.

Usage: python tools/analyze_fixtures.py [files...]
"""
import sys

sys.path.insert(0, "/root/repo")

from brotli_tpu.decode import engine as E

RINGS = (2048, 4096, 8192, 16384, 32768, 65536)


def analyze(path):
    data = open(path, "rb").read()
    stats = dict(
        metablocks=0, unc=0, meta=0, copies=0, copy_bytes=0,
        dict_refs=0, dict_bytes=0, lits=0,
        far_copies={r: 0 for r in RINGS}, far_bytes={r: 0 for r in RINGS},
        max_dist=0, trees=[], types=[], mlens=[],
    )

    orig_cw = E._Output.copy_within
    orig_rml = E._read_metablock_length
    orig_cl = E._command_loop
    orig_ms = E._MetablockState

    def cw(self, distance, length, _s=stats):
        _s["copies"] += 1
        _s["copy_bytes"] += length
        _s["max_dist"] = max(_s["max_dist"], distance)
        for r in RINGS:
            if distance > r - 16:
                _s["far_copies"][r] += 1
                _s["far_bytes"][r] += length
        return orig_cw(self, distance, length)

    def rml(br, input_end, _s=stats):
        mlen, is_unc, is_meta = orig_rml(br, input_end)
        _s["metablocks"] += 1
        _s["unc"] += bool(is_unc)
        _s["meta"] += bool(is_meta)
        if not (is_unc or is_meta):
            _s["mlens"].append(mlen)
        return mlen, is_unc, is_meta

    class MS(orig_ms):
        def __init__(self, br, large_window=False, _s=stats, **kw):
            super().__init__(br, large_window=large_window, **kw)
            _s["trees"].append(
                (len(self.lit_group), len(self.cmd_group),
                 len(self.dist_group))
            )
            _s["types"].append(tuple(self.num_types))

    E._Output.copy_within = cw
    E._read_metablock_length = rml
    E._MetablockState = MS
    try:
        out = E.decode(data)
    finally:
        E._Output.copy_within = orig_cw
        E._read_metablock_length = orig_rml
        E._MetablockState = orig_ms

    n = len(out)
    print(f"== {path.split('/')[-1]}: {len(data)} -> {n} bytes")
    print(f"   metablocks={stats['metablocks']} (unc={stats['unc']} "
          f"meta={stats['meta']}) mlens={stats['mlens'][:8]}")
    print(f"   trees(L,C,D) per mb: {stats['trees'][:6]}")
    print(f"   block types per mb: {stats['types'][:6]}")
    print(f"   lits~{n - stats['copy_bytes'] - stats['dict_bytes']} "
          f"copies={stats['copies']} copy_bytes={stats['copy_bytes']} "
          f"max_dist={stats['max_dist']}")
    for r in RINGS:
        fc, fb = stats["far_copies"][r], stats["far_bytes"][r]
        print(f"   ring {r:6d}: far_copies={fc:7d} far_bytes={fb:8d} "
              f"({100.0 * fb / max(n, 1):.1f}% of output)")


if __name__ == "__main__":
    files = sys.argv[1:] or [
        "/root/reference/bench/fixtures/enc-ttf.br",
        "/root/reference/bench/fixtures/enc-otf.br",
        "/root/reference/bench/fixtures/enc-var-ttf.br",
        "/root/reference/bench/fixtures/noto-tc.br",
    ]
    for f in files:
        analyze(f)
