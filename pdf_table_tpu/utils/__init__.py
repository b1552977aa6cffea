from .constants import Constants
from .logging_utils import logger, get_logger
from .file_utils import FileUtils
from .math_utils import MathUtils
from .time_utils import TimeUtils
from .benchmark_utils import print_timings, track_infer_time

__all__ = [
    "Constants",
    "logger",
    "get_logger",
    "FileUtils",
    "MathUtils",
    "TimeUtils",
    "print_timings",
    "track_infer_time",
]
