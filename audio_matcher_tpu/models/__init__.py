from .matcher import MatchConfig, SnippetMatcher, calc_chunks  # noqa: F401
from .spectrogram import SpectrogramConfig, SpectrogramMatcher  # noqa: F401
