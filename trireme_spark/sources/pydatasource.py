"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API) — the
plugin surface an external-system connector (REST pager, Cassandra token
ranges, message queue snapshot) implements when no JVM connector exists.

The reader models the token-range scan shape: each InputPartition is one
shard, read independently on an executor; rows derive deterministically
from (shard, offset) via the repo's Knuth hash, so the whole source is
value-checkable against an arithmetic oracle — the PLUMBING (partition
planning, per-partition iteration, schema projection through a Python
source) is what the key exercises, with deterministic content standing in
for the remote system exactly like the multimodal/PII plantings.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)

_KNUTH = 2654435761
_M31 = 2147483648
_M32 = 4294967296

N_SHARDS = 8
ROWS_PER_SHARD = 1000


class _ShardReader(DataSourceReader):
    def partitions(self):
        # one InputPartition per shard = the token-range planning step;
        # Spark schedules each to an executor core independently
        return [InputPartition(s) for s in range(N_SHARDS)]

    def read(self, partition):
        shard = partition.value
        base = shard * ROWS_PER_SHARD
        for off in range(ROWS_PER_SHARD):
            rid = base + off
            val = ((rid % _M31) * _KNUTH) % _M32
            yield (rid, shard, val)


class ShardedSyntheticSource(DataSource):
    """`spark.read.format("trireme_shards")` — 8 shards × 1000 rows."""

    @classmethod
    def name(cls) -> str:
        return "trireme_shards"

    def schema(self) -> str:
        return "record_id long, shard int, value long"

    def reader(self, schema):  # noqa: ARG002 - fixed-schema source
        return _ShardReader()
