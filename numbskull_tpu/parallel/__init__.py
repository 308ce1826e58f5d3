"""Multi-device parallelism: chain replication and graph sharding."""
