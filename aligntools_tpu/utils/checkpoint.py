"""Checkpoint / resume for large batch runs.

The reference is stateless (runs are one pair, sub-second; SURVEY.md §5);
large TPU batch runs over millions of pairs are not, so the pipeline
processes pairs in chunks and records completion in a JSON manifest next
to the output file. A re-run with the same manifest skips completed chunks
and appends only the remainder — results are written chunk-atomically
(tmp-file rename) so a killed run never leaves a torn output.
"""

from __future__ import annotations

import dataclasses
import json
import os


@dataclasses.dataclass
class Manifest:
    path: str
    input_path: str = ""
    mode: str = ""
    chunk_size: int = 0
    total_pairs: int = 0
    done_chunks: list = dataclasses.field(default_factory=list)

    @classmethod
    def load_or_create(cls, path, input_path, mode, chunk_size, total_pairs):
        if os.path.exists(path):
            with open(path) as f:
                data = json.load(f)
            m = cls(path=path, **{k: data[k] for k in (
                "input_path", "mode", "chunk_size", "total_pairs",
                "done_chunks")})
            if (m.input_path, m.mode, m.chunk_size, m.total_pairs) != (
                input_path, mode, chunk_size, total_pairs
            ):
                raise ValueError(
                    f"manifest {path} was written for a different run "
                    f"(input/mode/chunking changed); delete it to restart"
                )
            return m
        return cls(
            path=path, input_path=input_path, mode=mode,
            chunk_size=chunk_size, total_pairs=total_pairs,
        )

    def is_done(self, chunk_idx: int) -> bool:
        return chunk_idx in self.done_chunks

    def mark_done(self, chunk_idx: int) -> None:
        if chunk_idx not in self.done_chunks:
            self.done_chunks.append(chunk_idx)
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "input_path": self.input_path,
                    "mode": self.mode,
                    "chunk_size": self.chunk_size,
                    "total_pairs": self.total_pairs,
                    "done_chunks": self.done_chunks,
                },
                f,
            )
        os.replace(tmp, self.path)
