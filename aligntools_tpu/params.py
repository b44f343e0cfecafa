"""Alignment scoring parameters and pointer-state constants.

Mirrors the reference's ``opt_t`` defaults (reference: src/alignment.h:102-114 —
o=-5, e=-1, m=1, u=-2, j=-10) and pointer-state vocabulary (alignment.h:26-34).
The reference encodes pointer states as LEFT=100 … JUMP=800; we use a compact
uint8 enum so pointer matrices pack into 1 byte (and 3 bits inside kernels).
"""

from __future__ import annotations

import dataclasses

# Compact pointer-state encoding (reference states at alignment.h:26-34).
# 0 is reserved for "unwritten" — the reference callocs its pointer matrices
# (alignment.h:137-146) and only writes a pointer when max5 sees a finite arg.
PTR_UNSET = 0
PTR_LOW = 1  # reference LOW  (500): gap in target, consume query char
PTR_MID = 2  # reference MID  (600): diagonal match/mismatch
PTR_UPP = 3  # reference UPP  (700): gap in query, consume target char
PTR_JUMP = 4  # reference JUMP (800): fit-mode intron jump along target
PTR_HOME = 5  # reference HOME (400): local-mode stop (score floor 0)
PTR_LEFT = 6  # reference LEFT (100): overlap-mode gap in query
PTR_DIAG = 7  # reference DIAGONAL (200)
PTR_RIGHT = 8  # reference RIGHT (300): overlap-mode gap in target

# Safe "minus infinity" for f32 device kernels: large enough that adding any
# realistic penalty is absorbed (acts exactly like -INF under ties), small
# enough that sums of a few sentinels cannot overflow f32.
NEG_INF_F32 = -1.0e30

MODES = ("global", "local", "fit", "overlap", "edit")


@dataclasses.dataclass(frozen=True)
class AlignParams:
    """Scoring parameters; defaults match the reference (alignment.h:102-114)."""

    match: int = 1  # opt->m
    mismatch: int = -2  # opt->u
    gap_open: int = -5  # opt->o  (cost of the FIRST gap char, not open+extend)
    gap_extend: int = -1  # opt->e
    jump: int = -10  # opt->j  (fit mode junction jump penalty)

    def replace(self, **kw) -> "AlignParams":
        return dataclasses.replace(self, **kw)
