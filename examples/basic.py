"""Basic usage: the five alignment modes through the Python API."""
from aligntools_tpu import AlignParams, align_pair

p = AlignParams(match=2, mismatch=-2, gap_open=-4, gap_extend=-1)

r = align_pair("global", b"GATTACA", b"GATCACA", p)
print("global:", r.score, r.row1.decode(), r.row2.decode())

r = align_pair("local", b"AAAGATTACAAAA", b"TTTGATCACATTT", p)
print("local: ", r.score, r.row1.decode(), r.row2.decode())

# fit: short read into a long target, with junction-gated jump sites
r = align_pair("fit", b"ACGTACGT", b"TTTTACGTGGGGGGGGACGTTTTT", p,
               sites=[8, 16])
print("fit:   ", r.score, r.row1.decode(), r.row2.decode())

r = align_pair("overlap", b"CCCCACGT", b"ACGTGGGG", p)
print("overlap:", r.score)

d = align_pair("edit", b"kitten", b"sitting", AlignParams(mismatch=1))
print("edit distance:", d)

# banded: O(m*W) work for similar pairs; full rows, certificate-driven
# band doubling for provably exact scores (engine/banded.py docstring)
from aligntools_tpu.engine.banded import banded_align, banded_score_auto

r, edge = banded_align("global", b"GATTACATTTT", b"GATCACATTAT", band=4, params=p)
print("banded: ", r.score, r.row1.decode(), r.row2.decode())
score, band, certified = banded_score_auto("global", b"GATTACA" * 40,
                                           b"GATCACA" * 40, p)
print(f"banded auto: score={score} band={band} certified={certified}")
