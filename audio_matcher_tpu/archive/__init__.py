from .data import (  # noqa: F401
    Archive,
    Chapter,
    ChapterNumber,
    Series,
    Source,
    build_timelabel_name,
    parse_line,
)
