from .mesh import make_mesh  # noqa: F401
from .sweep import sharded_match_step, ShardedScanner  # noqa: F401
