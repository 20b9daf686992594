from .correlate import (  # noqa: F401
    Mode,
    PreparedSnippet,
    correlate,
    correlate_valid_batch,
    fft_length,
    prepare_snippet,
)
from .peaks import (  # noqa: F401
    Peak,
    find_peaks_device,
    pick_peaks_batch,
    pick_peaks_core,
)
from .resample import resample_poly_device  # noqa: F401
from .stft import fingerprint_scores, log_mel, mel_filterbank  # noqa: F401
