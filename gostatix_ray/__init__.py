"""gostatix_ray — Ray-Data-native distributed sketch / approximate-aggregation engine.

A from-scratch re-creation of kwertop/gostatix's probabilistic data
structures (Bloom, Cuckoo, HyperLogLog, Count-Min, Top-K) plus t-digest
and KLL quantiles, as mergeable UDAFs over ``ray.data.Dataset`` of
Parquet transcript tables.  See SURVEY.md for the blueprint.
"""

__version__ = "0.1.0"


def _install_ray_log_filter():
    """Drop ONE known-cosmetic Ray Data warning.

    Ray's sort-based shuffle emits schema-LESS empty blocks for empty
    boundary partitions whenever the sampled key range has more
    partitions than distinct keys (reproducible with a plain
    ``groupby().map_groups`` on 8 blocks / 3 keys — nothing of ours in
    the loop), and ``streaming_executor_state`` then warns
    "RefBundle with a different schema ... new schema: ." once per
    transition.  Our own stages never emit schemaless blocks (empty
    batches are skipped at every map boundary — see
    dedup.bucketed_groupby); this filter drops exactly that
    empty-new-schema flavor and nothing else, so real schema drift
    still surfaces.
    """
    import logging

    class _EmptySortPartitionFilter(logging.Filter):
        def filter(self, record: logging.LogRecord) -> bool:
            msg = record.getMessage()
            return not (
                "Operator produced a RefBundle with a different schema" in msg
                and ("new schema: ." in msg
                     or "new schema: PandasBlockSchema(names=[], types=[])." in msg)
            )

    logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    ).addFilter(_EmptySortPartitionFilter())


_install_ray_log_filter()
