"""FASTA/FASTQ ingest — kseq-equivalent streaming parser (pure Python).

Mirrors the vendored klib parser the reference uses (reference: src/kseq.h,
instantiated over gzread at src/alignment.h:23) closely enough for byte
parity on all its observable behavior:

  * records start at '>' (FASTA) or '@' (FASTQ); multi-line sequences are
    concatenated; empty lines inside a record are skipped (kseq.h:207-210);
  * header is split at the FIRST whitespace char: name before it, comment =
    the rest of the line (kseq.h:200-201), trailing '\\r' stripped
    (kseq.h:143);
  * FASTQ '+' separator line is skipped and quality is read until it reaches
    the sequence length (kseq.h:221-228);
  * transparent gzip (the reference always goes through gzopen, which also
    reads plain files).

Also implements the reference's pair-reading contract ``kstring_read``
(alignment.h:217-262): exactly two records (die on a third), junction sites
parsed from the SECOND record's comment as '|'-separated ints via ksplit
(empty fields skipped — kstring.c:89-131) + C atoi semantics.

A C++ native implementation of the same parser (native/aligntools_native.cpp)
is preferred at runtime when built (see aligntools_tpu.native); this module
is the always-available fallback and its oracle.
"""

from __future__ import annotations

import dataclasses
import gzip
import io as _io
from typing import Iterator, Sequence

_WS = b" \t\n\v\f\r"  # C isspace set


@dataclasses.dataclass
class FastaRecord:
    name: bytes
    comment: bytes | None
    seq: bytes
    qual: bytes | None = None


def _open_maybe_gzip(path: str) -> _io.BufferedReader:
    f = open(path, "rb")
    magic = f.peek(2)[:2] if hasattr(f, "peek") else f.read(2)
    if magic == b"\x1f\x8b":
        return gzip.open(path, "rb")  # type: ignore[return-value]
    return f


def _split_header(line: bytes) -> tuple[bytes, bytes | None]:
    """Split a header line body (without the '>'/'@') into name/comment at the
    first isspace char; comment is None when the separator was the newline."""
    for i, b in enumerate(line):
        if b in _WS:
            return line[:i], line[i + 1 :]
    return line, None


def read_records(path: str) -> Iterator[FastaRecord]:
    from aligntools_tpu import native

    if native.available():
        recs = native.parse_records_native(path)
        if recs is not None:
            yield from recs
            return
    with _open_maybe_gzip(path) as f:
        yield from parse_records(f)


def parse_records(f) -> Iterator[FastaRecord]:
    name = comment = None
    seq_parts: list[bytes] = []
    in_record = False
    fastq = False
    lines = iter(f)
    line = next(lines, None)
    # skip junk before the first record (kseq.h:194 scans to '>'/'@')
    while line is not None and not line.startswith((b">", b"@")):
        line = next(lines, None)
    while line is not None:
        body = line.rstrip(b"\n")
        if body.endswith(b"\r"):
            body = body[:-1]
        fastq = body.startswith(b"@")
        name, comment = _split_header(body[1:])
        seq_parts = []
        qual = None
        line = next(lines, None)
        while line is not None and not line.startswith((b">", b"@", b"+")):
            part = line.rstrip(b"\n")
            if part.endswith(b"\r"):
                part = part[:-1]
            if part:
                seq_parts.append(part)
            line = next(lines, None)
        seq = b"".join(seq_parts)
        if fastq and line is not None and line.startswith(b"+"):
            # skip '+' line, then read quality until it reaches len(seq)
            line = next(lines, None)
            qparts: list[bytes] = []
            qlen = 0
            while line is not None and qlen < len(seq):
                part = line.rstrip(b"\n")
                if part.endswith(b"\r"):
                    part = part[:-1]
                qparts.append(part)
                qlen += len(part)
                line = next(lines, None)
            qual = b"".join(qparts)
        yield FastaRecord(name=name, comment=comment, seq=seq, qual=qual)


def c_atoi(s: bytes) -> int:
    """C atoi: skip leading whitespace, optional sign, digits; 0 on no-parse."""
    i = 0
    while i < len(s) and s[i] in _WS:
        i += 1
    sign = 1
    if i < len(s) and s[i : i + 1] in (b"+", b"-"):
        sign = -1 if s[i : i + 1] == b"-" else 1
        i += 1
    j = i
    while j < len(s) and 0x30 <= s[j] <= 0x39:
        j += 1
    return sign * int(s[i:j]) if j > i else 0


def parse_junctions(comment: bytes) -> list[int]:
    """ksplit(tmp, '|') + atoi per field (alignment.h:250-253). ksplit skips
    empty fields (consecutive delimiters produce no field: kstring.c:120-125)."""
    return [c_atoi(tok) for tok in comment.split(b"|") if tok != b""]


@dataclasses.dataclass
class Pair:
    seq1: bytes
    seq2: bytes
    sites: list[int] | None  # parsed junctions (only when requested)
    comment2: bytes | None  # raw second-record comment (echoed by fit -s)


def read_pair(path: str, want_sites: bool = False) -> Pair:
    """kstring_read equivalent (alignment.h:217-262): exactly 2 records."""
    records: list[FastaRecord] = []
    for rec in read_records(path):
        if len(records) >= 2:
            raise ValueError("input fasta file has more than 2 sequences")  # :233
        records.append(rec)
    if len(records) < 2 or records[0].seq == b"" or records[1].seq == b"":
        # the reference dies on NULL seq pointers (:239); empty seqs it would
        # accept but they hit kernel UB — we reject both up front.
        if len(records) < 2:
            raise ValueError("read_kstring: fail to read sequence")
    sites = None
    comment2 = records[1].comment
    if want_sites:
        if comment2 is None:
            raise ValueError("fail to read junction sites")  # :244
        sites = parse_junctions(comment2)
    return Pair(records[0].seq, records[1].seq, sites, comment2)


def read_pairs_many(paths: Sequence[str]) -> list[Pair]:
    return [read_pair(p) for p in paths]
