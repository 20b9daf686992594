from .audacity import AudacityApi, AudacityError, LaunchError  # noqa: F401
from .pipeline import WorkerArgs, calc_merged_offsets, run_worker  # noqa: F401
