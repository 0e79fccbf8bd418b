from densemonoslam_tpu.utils import se3
from densemonoslam_tpu.utils.timer import Stopwatch
from densemonoslam_tpu.utils.stats import SessionStats

__all__ = ["se3", "Stopwatch", "SessionStats"]
