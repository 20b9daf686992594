from .correlate import (  # noqa: F401
    Mode,
    PreparedSnippet,
    correlate,
    correlate_valid_batch,
    fft_length,
    prepare_snippet,
)
from .peaks import Peak, find_peaks_device, pick_peaks_batch  # noqa: F401
