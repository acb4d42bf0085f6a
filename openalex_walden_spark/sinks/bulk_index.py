"""S5: bulk-index sink (Elasticsearch-shaped) via foreachPartition.

The reference's ES sync (``sync_works.ipynb`` cells 1-4): documents are
bulk-posted per partition with a partition-count ladder sized to ~10k
docs/partition. The transport is pluggable here — the real
``elasticsearch.helpers.bulk`` client isn't in this container, so tests
inject a recording transport; the partitioning, batching, and
per-partition connection lifecycle are the actual operator.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Iterator

from pyspark.sql import DataFrame, Row


def partition_count_for(n_rows: int, rows_per_partition: int = 10_000, lo: int = 1, hi: int = 8096) -> int:
    """The reference's sizing ladder (sync_works.ipynb cell 4): coalesce
    small syncs, range-partition huge ones, target ~10k docs/partition."""
    return max(lo, min(hi, (n_rows + rows_per_partition - 1) // rows_per_partition))


def bulk_index(
    df: DataFrame,
    doc_col: str,
    transport_factory: Callable[[], Callable[[Iterable[str]], int]],
    batch_size: int = 500,
    rows_per_partition: int = 10_000,
) -> None:
    """Index every row's ``doc_col`` JSON document.

    ``transport_factory`` is invoked ONCE per partition (per-executor
    connection, the foreachPartition pattern); it returns a callable that
    ships one batch of documents and returns the accepted count.
    """
    n = df.count()
    target = partition_count_for(n, rows_per_partition)
    docs = df.select(doc_col)
    if docs.rdd.getNumPartitions() != target:
        docs = docs.repartition(target)

    def send_partition(rows: Iterator[Row]) -> None:
        send = transport_factory()
        batch: list[str] = []
        for row in rows:
            batch.append(row[0])
            if len(batch) >= batch_size:
                send(batch)
                batch = []
        if batch:
            send(batch)

    docs.foreachPartition(send_partition)


def write_jdbc(df: DataFrame, url: str, table: str, mode: str = "append", **options) -> None:
    """S7: JDBC sink — thin wrapper over df.write.jdbc (the Wunpaywall →
    Postgres path, WunpaywallToOpenAlexDB.py). Requires a JDBC driver on
    the classpath; callers own retry/idempotency (the reference stages
    into a temp table then swaps). Executed end-to-end against embedded
    Derby in tests/test_io.py::test_jdbc_roundtrip_embedded_derby."""
    df.write.format("jdbc").option("url", url).option("dbtable", table).options(
        **options
    ).mode(mode).save()
