"""Structured Streaming counterparts.

The reference has no streams (SURVEY §2.12) — its Watcher loop is job
orchestration.  A 100 TB training-data pipeline does need incremental
ingest, so this module provides the streaming shape of the engine's core
aggregations: watermarked windowed rollups over an events feed and
exactly-once-style dedup on arrival.
"""

from .incremental_dedup import start_incremental_dedup
from .joins import streaming_attribution_join
from .topk import streaming_topk_spenders
from .rollup import streaming_enrich, streaming_event_rollup, streaming_exact_dedup

__all__ = [
    "start_incremental_dedup",
    "streaming_attribution_join",
    "streaming_topk_spenders",
    "streaming_enrich",
    "streaming_event_rollup",
    "streaming_exact_dedup",
]
