"""Unified source/sink layer (SURVEY §2.1): one interface over Kafka, files,
rate and replay sources so pipelines are written once and bound to transports
at the edge — the reference hard-wires Kafka everywhere (S1-S6/K1-K5)."""

from fdp_dynamically_controlled_streams_spark.sources.registry import (
    read_batch,
    read_stream,
    replay_dir,
    write_stream_kafka,
)

__all__ = ["read_batch", "read_stream", "replay_dir", "write_stream_kafka"]
