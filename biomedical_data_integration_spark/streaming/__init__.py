"""Streaming extensions (batch + Structured Streaming faces)."""

from biomedical_data_integration_spark.streaming.events import (
    hopping_window_agg,
    sessionize,
    streaming_asof_join,
    streaming_attribute_conversions,
    streaming_dedup_exact,
    streaming_interval_join,
    streaming_materialize,
    streaming_hopping_window_agg,
    streaming_minhash_lsh_candidates,
    streaming_sessionize,
    streaming_transition_counts,
    streaming_tumbling_window_agg,
    tumbling_window_agg,
)

__all__ = [
    "hopping_window_agg",
    "sessionize",
    "streaming_asof_join",
    "streaming_attribute_conversions",
    "streaming_dedup_exact",
    "streaming_interval_join",
    "streaming_materialize",
    "streaming_hopping_window_agg",
    "streaming_minhash_lsh_candidates",
    "streaming_sessionize",
    "streaming_transition_counts",
    "streaming_tumbling_window_agg",
    "tumbling_window_agg",
]
