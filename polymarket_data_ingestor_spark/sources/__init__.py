from polymarket_data_ingestor_spark.sources.frames import (
    parse_feed_messages,
    read_frames,
)
from polymarket_data_ingestor_spark.sources.markets import read_market_info
from polymarket_data_ingestor_spark.sources.paths import (
    discover_files,
    hour_range,
    parse_duration,
    parse_time_range,
    parse_timestamp_multi,
)

__all__ = [
    "read_frames",
    "parse_feed_messages",
    "read_market_info",
    "discover_files",
    "hour_range",
    "parse_duration",
    "parse_time_range",
    "parse_timestamp_multi",
]
