"""Multi-chip (mesh) encode path: shard_map over MCU-row shards."""
