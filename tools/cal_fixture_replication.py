#!/usr/bin/env python3
"""Bit-exact Python replication of the calibrated multimodal fixtures
(graft.ext.Multimodal.calBit / calTargetBit / image aHash), used to
validate fixture decorrelation BEFORE any Spark run: near-dup output
must be exactly 6 pairs per 4-member family with ZERO cross-family
pairs, at every corpus size.

This is the harness that falsified the r13 fixtures (single-round
Lehmer mix: 460 489 pairs at 5 000 docs against a designed 7 500 —
the mix is affine in the clique for fixed pos, and threshold-at-mean
preserves affine structure) and validated the r14 rewrite (two
Lehmer-square rounds, direct-bit encoding: 7 500 / 75 000 pairs at
5 000 / 50 000 docs, zero cross-family).

Usage: python3 tools/cal_fixture_replication.py [n_docs=5000]
Exit 1 if the calibration property fails.
"""
import sys
from collections import defaultdict

M = 2147483647


def cal_bit(clique, pos):
    """Mirrors Multimodal.calBit: two Lehmer-square rounds, pos
    re-injected between them."""
    h = (clique * 48271 + pos * 12289 + 9973) % M
    h = (h * h) % M
    h = ((h + pos * 48271 + 7919) * 69621) % M
    h = (h * h) % M
    return (h >> 15) & 1


def fp_image(id_):
    """Mirrors calTargetBit for the image modality (pos space 0-63)."""
    fam, member = id_ // 4, id_ % 4
    fp = 0
    for p in range(64):
        b = cal_bit(fam, p)
        if p == 0:
            b = 1
        if p == 63:
            b = 0
        if p == member * 9:
            b ^= 1
        if b:
            fp |= 1 << p
    return fp


def near_pairs(fps, maxham=3):
    """Banded hamming-<=3 pairs, the operator's candidate scheme."""
    buckets = defaultdict(list)
    for i, f in enumerate(fps):
        for c in range(4):
            buckets[(c, (f >> (16 * c)) & 0xFFFF)].append(i)
    cand = set()
    for v in buckets.values():
        for a in range(len(v)):
            for b in range(a + 1, len(v)):
                cand.add((v[a], v[b]))
    return [(a, b) for a, b in cand
            if bin(fps[a] ^ fps[b]).count("1") <= maxham]


def main(n):
    fps = [fp_image(i) for i in range(n)]
    pairs = near_pairs(fps)
    cross = [(a, b) for a, b in pairs if a // 4 != b // 4]
    expect = n // 4 * 6
    print(f"docs={n} near_pairs={len(pairs)} expected={expect} cross_family={len(cross)}")
    if len(pairs) != expect or cross:
        print("CALIBRATION FAILED — fixture families are correlated")
        return 1
    print("calibration OK: exactly 6 pairs/family, zero cross-family")
    return 0


if __name__ == "__main__":
    sys.exit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 5000))
