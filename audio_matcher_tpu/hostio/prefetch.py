"""Pipelined host decode: prefetch audio files ahead of device compute.

The reference's hot loop decodes mp3 lazily on the scanning thread
(SURVEY.md §3.1 — the serial decode feeds the chunker); TPU-side the decode
must instead run AHEAD of the device so host I/O and accelerator compute
overlap. A small thread pool decodes up to ``depth`` files in advance into
a bounded queue (double/triple buffering).
"""

from __future__ import annotations

import concurrent.futures as cf
import dataclasses
import logging
from pathlib import Path
from typing import Iterable, Iterator

import numpy as np

from .decode import read_audio

log = logging.getLogger("audio_matcher.prefetch")


@dataclasses.dataclass
class DecodedFile:
    path: Path
    sr: int
    samples: np.ndarray
    error: Exception | None = None


def decode_prefetched(
    paths: Iterable[str | Path],
    depth: int = 2,
    workers: int = 2,
) -> Iterator[DecodedFile]:
    """Yield decoded files in order while decoding ``depth`` ahead."""
    paths = [Path(p) for p in paths]

    def job(path: Path) -> DecodedFile:
        try:
            sr, samples = read_audio(path)
            return DecodedFile(path, sr, samples)
        except Exception as exc:  # noqa: BLE001 — surfaced to the consumer
            return DecodedFile(path, 0, np.zeros(0, np.float32), exc)

    with cf.ThreadPoolExecutor(max_workers=workers) as pool:
        pending: list[cf.Future] = []
        it = iter(paths)
        for _ in range(depth):
            nxt = next(it, None)
            if nxt is not None:
                pending.append(pool.submit(job, nxt))
        while pending:
            fut = pending.pop(0)
            nxt = next(it, None)
            if nxt is not None:
                pending.append(pool.submit(job, nxt))
            yield fut.result()
