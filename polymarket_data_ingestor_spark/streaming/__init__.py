from polymarket_data_ingestor_spark.streaming.collector import (
    FrameWriter,
    split_markets,
    take_chunk,
)
from polymarket_data_ingestor_spark.streaming.live import (
    apply_cdc_stream,
    bootstrap_dedup_state,
    live_cusum,
    live_dedup_stream,
    live_distinct_rollup,
    live_dq_check,
    live_materialize,
    live_quantile_rollup,
    live_rollup,
    live_ticks,
    read_rollup_state,
    read_frames_stream,
    write_frames_stream,
)

__all__ = [
    "FrameWriter",
    "split_markets",
    "take_chunk",
    "read_frames_stream",
    "write_frames_stream",
    "live_ticks",
    "apply_cdc_stream",
    "bootstrap_dedup_state",
    "live_cusum",
    "live_dedup_stream",
    "live_rollup",
    "live_distinct_rollup",
    "live_quantile_rollup",
    "live_dq_check",
    "live_materialize",
    "read_rollup_state",
]
