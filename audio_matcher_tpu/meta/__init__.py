from .progress import Progress, State  # noqa: F401
from .tagger import (  # noqa: F401
    Album,
    Artist,
    Disk,
    Genre,
    Length,
    TaggedFile,
    Title,
    TotalDisks,
    TotalTracks,
    Track,
    Year,
)
from .index import Index, MultiIndex, ChapterEntry  # noqa: F401
