"""gostatix_ray — Ray-Data-native distributed sketch / approximate-aggregation engine.

A from-scratch re-creation of kwertop/gostatix's probabilistic data
structures (Bloom, Cuckoo, HyperLogLog, Count-Min, Top-K) plus t-digest
and KLL quantiles, as mergeable UDAFs over ``ray.data.Dataset`` of
Parquet transcript tables.  See SURVEY.md for the blueprint.
"""

__version__ = "0.1.0"
