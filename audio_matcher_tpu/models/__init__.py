from .matcher import MatchConfig, SnippetMatcher, calc_chunks  # noqa: F401
