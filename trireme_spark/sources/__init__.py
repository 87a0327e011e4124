"""Sources & sinks (SURVEY.md §2.1).

The reference's surface is a source→transform→sink pipeline
(Cassandra → Solr per BASELINE.json:6). Neither connector jar is installable
offline (SURVEY.md §2.1 note), so the engine exposes a thin source/sink
interface with a parquet-backed implementation; the connector formats are
documented drop-ins:

* Cassandra source: ``spark.read.format("org.apache.spark.sql.cassandra")
  .options(table=..., keyspace=...)`` — same DataFrame downstream.
* Solr sink: ``df.write.format("solr").options(zkhost=..., collection=...)``
  — same upsert semantics as :func:`trireme_spark.queries.scans` s7.
"""

from trireme_spark.sources.io import table, write_read_roundtrip  # noqa: F401
