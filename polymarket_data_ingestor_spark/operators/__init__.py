from polymarket_data_ingestor_spark.operators.replay import replay, replay_feed_messages

__all__ = ["replay", "replay_feed_messages"]
