"""Custom Python DataSource for the POS REST API (Spark 4+).

The scale-out form of S1/S2 (SURVEY.md §2.1): instead of a
driver-side fetch loop, page ranges become input partitions so
EXECUTORS fetch concurrently — the ingest parallelism the reference's
single-threaded cursor walk (reference: etl/extract.py:60-104) cannot
reach. Register once, then it's a first-class format:

    spark.dataSource.register(PosApiDataSource)
    df = (spark.read.format("pos_api")
          .option("pages", "8").option("page_size", "100")
          .option("mode", "synthetic").load())

``mode=synthetic`` serves deterministic receipts for tests/benches
(executors cannot reach a live API in this environment); a real
deployment implements ``_fetch_page`` with its HTTP client — the
partition planning, schema contract, and Arrow row shape stay
identical.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from pos_api_pipeline_spark.schemas import RECEIPT_SCHEMA


class PagePartition(InputPartition):
    def __init__(self, start_page: int, end_page: int, page_size: int, mode: str):
        self.start_page = start_page
        self.end_page = end_page
        self.page_size = page_size
        self.mode = mode


def _synthetic_receipt(i: int) -> tuple:
    """Deterministic receipt #i (same shape the flattener consumes)."""
    day = 1 + (i % 28)
    hour = i % 24
    iso = f"2025-07-{day:02d}T{hour:02d}:00:00.000Z"
    orders = ["Mesa 2", "A domicilio 01", "Para Llevar", "algo-x", "mostrador"]
    line_items = [
        (
            f"Item {i % 50}",
            10.0 + (i % 7),
            25.0 + (i % 13),
            25.0 + (i % 13),
            [("Mayonesa", "Ajo")] if i % 3 == 0 else [],
        )
    ]
    if i % 4 == 0:
        line_items.append((f"Extra {i % 11}", 5.0, 12.0, 12.0, []))
    return (
        f"1-{i}",
        iso,
        iso,
        iso,
        orders[i % 5],
        [("CASH",)] if i % 2 == 0 else [("CARD",)],
        line_items,
    )


class PosApiReader(DataSourceReader):
    def __init__(self, options):
        self.n_pages = int(options.get("pages", "4"))
        self.page_size = int(options.get("page_size", "100"))
        self.pages_per_partition = int(options.get("pages_per_partition", "1"))
        self.mode = options.get("mode", "synthetic")

    def partitions(self):
        step = self.pages_per_partition
        return [
            PagePartition(p, min(p + step, self.n_pages), self.page_size, self.mode)
            for p in range(0, self.n_pages, step)
        ]

    def read(self, partition: PagePartition):
        if partition is None:  # empty partition list → one read(None) call
            return
        if partition.mode != "synthetic":
            raise NotImplementedError(
                "live HTTP mode requires an HTTP client on executors; "
                "implement _fetch_page for the deployment environment"
            )
        for page in range(partition.start_page, partition.end_page):
            base = page * partition.page_size
            for i in range(base, base + partition.page_size):
                yield _synthetic_receipt(i)


class PosApiStreamReader(SimpleDataSourceStreamReader):
    """Streaming flavor: each micro-batch reads the next page window.

    Offsets are page numbers — exactly the cursor/watermark the
    reference tracks in its JSON state file (etl/extract.py:201-252),
    but managed by the Structured Streaming checkpoint instead, which
    gives exactly-once batch tracking for free.
    """

    def __init__(self, options):
        self.page_size = int(options.get("page_size", "100"))
        self.pages_per_batch = int(options.get("pages_per_batch", "1"))
        self.max_pages = int(options.get("pages", "4"))
        self.mode = options.get("mode", "synthetic")

    def initialOffset(self) -> dict:
        return {"page": 0}

    def read(self, start: dict):
        page = start["page"]
        end_page = min(page + self.pages_per_batch, self.max_pages)
        if self.mode != "synthetic":
            raise NotImplementedError(
                "live HTTP mode requires an HTTP client; implement here"
            )
        rows = [
            _synthetic_receipt(i)
            for p in range(page, end_page)
            for i in range(p * self.page_size, (p + 1) * self.page_size)
        ]
        return iter(rows), {"page": end_page}

    def readBetweenOffsets(self, start: dict, end: dict):
        rows = [
            _synthetic_receipt(i)
            for p in range(start["page"], end["page"])
            for i in range(p * self.page_size, (p + 1) * self.page_size)
        ]
        return iter(rows)


class PosApiDataSource(DataSource):
    @classmethod
    def name(cls):
        return "pos_api"

    def schema(self):
        return RECEIPT_SCHEMA

    def reader(self, schema):
        return PosApiReader(self.options)

    def simpleStreamReader(self, schema):
        return PosApiStreamReader(self.options)
