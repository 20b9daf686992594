"""Audacity label-track files ("TimeLabel").

Parity: the reference's first-party ``audacity`` crate data types
(``TimeLabel::{read, write}``, used by matcher/mod.rs:94-99 to emit match
segments and archive/data.rs:124 to read archives). File format is
Audacity's label track export: one ``start<TAB>end<TAB>name`` line per
label, seconds with 6 decimals.

Also provides ``timelabel_from_peaks`` (parity: archive/data.rs:87-107):
consecutive peak pairs become labels [start+delay, next_start) named by a
``#``-substituted pattern, numbered from 1.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Iterable, Sequence

from ..ops.peaks import Peak


@dataclasses.dataclass
class TimeLabel:
    start: float  # seconds
    end: float
    name: str | None = None

    def to_line(self) -> str:
        name = self.name or ""
        return f"{self.start:.6f}\t{self.end:.6f}\t{name}"

    @classmethod
    def from_line(cls, line: str) -> "TimeLabel":
        parts = line.rstrip("\n").split("\t")
        if len(parts) < 2:
            raise ValueError(f"not a label line: {line!r}")
        name = parts[2] if len(parts) > 2 and parts[2] != "" else None
        return cls(float(parts[0]), float(parts[1]), name)


def read_labels(path: str | Path) -> list[TimeLabel]:
    out = []
    for line in Path(path).read_text().splitlines():
        if not line.strip():
            continue
        if line.startswith("\\"):
            # Audacity spectral-selection frequency line ("\\<lo>\t<hi>")
            # accompanying the previous label — not a label itself
            continue
        out.append(TimeLabel.from_line(line))
    return out


def write_labels(
    labels: Iterable[TimeLabel], path: str | Path, dry_run: bool = False
) -> None:
    text = "".join(lb.to_line() + "\n" for lb in labels)
    if dry_run:
        print(f"[dry-run] would write labels to {path}:\n{text}", end="")
        return
    Path(path).write_text(text)


def timelabel_from_peaks(
    peaks: Sequence[Peak],
    sr: int,
    delay_start_secs: float = 7.0,
    name_pattern: str = "Segment #",
) -> list[TimeLabel]:
    """Labels spanning consecutive peaks, starts delayed by ``delay_start``.

    n peaks → n-1 labels; label i (1-based) runs from peak_i+delay to
    peak_{i+1}; '#' in the pattern is replaced by the number.
    Parity: archive/data.rs:87-107 + matcher/mod.rs:92-100.
    """
    starts = [p.start_secs(sr) for p in peaks]
    # peaks closer than the delay would invert the label (start > end,
    # which Audacity rejects) — clamp to a zero-length label instead
    return [
        TimeLabel(
            start=min(a + delay_start_secs, b),
            end=b,
            name=name_pattern.replace("#", str(i)),
        )
        for i, (a, b) in enumerate(zip(starts, starts[1:]), start=1)
    ]
