"""Relational operators beyond plain DataFrame verbs.

Scale-first implementations of the join/session shapes a training-data
pipeline needs but Spark does not ship as single verbs: as-of join
(union + window, one shuffle), gap sessionization (built-in
``session_window``), and salted joins for skewed keys.
"""

from .asof import asof_join
from .binning import assign_bins, quantile_bins, quantile_cutpoints
from .filter_join import filter_pruned_join, prune_stats
from .range_join import interval_join
from .salted import salted_join
from .sampling import (
    sample_hash,
    sample_sql,
    split_hash,
    stratified_sample_hash,
    stratified_sample_sql,
)
from .sessions import sessionize

__all__ = [
    "asof_join",
    "assign_bins",
    "quantile_bins",
    "quantile_cutpoints",
    "filter_pruned_join",
    "prune_stats",
    "interval_join",
    "salted_join",
    "sample_hash",
    "sample_sql",
    "sessionize",
    "split_hash",
    "stratified_sample_hash",
    "stratified_sample_sql",
]
