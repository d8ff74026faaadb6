from . import intervals, merging, misc, modes, resampling, sequences  # noqa: F401
