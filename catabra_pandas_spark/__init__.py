"""catabra_pandas_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of risc-mi/catabra-pandas (reference studied at
/root/reference, catabra-pandas 0.0.6).

This is NOT a port: the reference is an eager, single-process numpy/pandas
library; this package re-expresses the same operator semantics as lazy,
distributed Spark DataFrame transformations so that Catalyst/Tungsten/AQE pick
the physical strategy. See SURVEY.md for the blueprint.

Public API mirrors ``catabra_pandas/__init__.py:20-37`` of the reference,
minus the pandas-positional helpers (``get_loc``, ``iloc_loc``,
``iloc_loc_assign``) which have no meaning on immutable distributed
DataFrames (documented N/A-by-design in SURVEY.md §2.1 #14-15).
``partition_series`` (#13) survives as ``pipeline.packing.pack_bins``
(first_fit mode = the reference algorithm with ``shuffle=False``, packed
per group in parallel) plus the LLM-training shapes built on it
(``pack_sequences``, ``chunk_documents``).

Beyond reference parity, ``catabra_pandas_spark.pipeline`` adds the
large-scale training-data operators (dedup, similarity search, text analysis,
multimodal plumbing).
"""

from .operators.asof import merge_asof
from .operators.events import funnel, retention
from .operators.merging import find_containing_interval, merge_intervals
from .operators.sweep import sweep_point_in_interval
from .operators.intervals import combine_intervals, group_intervals
from .operators.sequences import impute, prev_next_values
from .operators.modes import grouped_mode
from .operators.misc import (encode_ordered_categories, factorize,
                             grouped_topk, inner_or_cross_join)
from .operators.resampling import make_windows, resample_eav, resample_interval

__all__ = [
    "resample_eav",
    "resample_interval",
    "make_windows",
    "group_intervals",
    "grouped_mode",
    "inner_or_cross_join",
    "prev_next_values",
    "combine_intervals",
    "find_containing_interval",
    "impute",
    "encode_ordered_categories",
    "factorize",
    "grouped_topk",
    "merge_intervals",
    "merge_asof",
    "sweep_point_in_interval",
]

__version__ = "0.1.0"
