"""Custom Python data source (PySpark 4 DataSource API) for
paginated-API ingestion — the fully Spark-native form of SURVEY.md
§2.1 S1/S2 ("custom DataSource ... with one partition per page").

Where sources/paginated.py distributes fetches over an existing keys
DataFrame with mapInPandas, this exposes the API as a first-class
reader:

    spark.dataSource.register(PagedApiDataSource)
    df = (spark.read.format("paged_api")
          .option("keys", "1,2,3")        # or key_start/key_end range
          .load())

Planning: one InputPartition per key — a cursor chain is sequential
by construction (each page token comes from the previous response),
so the page is the unit of WORK but the key is the unit of
PARALLELISM. Retry/backoff/domain-skip semantics (S13-S15) reuse the
same policy machinery as the mapInPandas fetcher. The client is the
deterministic MockPagedClient (no network in this environment); a
real HTTP client implements the same fetch_page signature.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from zoom_spark.sources.paginated import (
    DomainSkipError,
    MockPagedClient,
    RetryPolicy,
    _with_retry,
)

SCHEMA_DDL = "key string, item_id bigint, value double"


class KeyPartition(InputPartition):
    def __init__(self, key: str):
        self.key = key


class PagedApiReader(DataSourceReader):
    def __init__(self, options: dict):
        self.options = options
        keys_opt = options.get("keys")
        if keys_opt:
            self.keys = [k.strip() for k in keys_opt.split(",") if k.strip()]
        else:
            lo = int(options.get("key_start", 0))
            hi = int(options.get("key_end", 0))
            self.keys = [str(k) for k in range(lo, hi)]

    def partitions(self):
        # one partition per key: cursor chains are sequential within a
        # key and independent across keys
        return [KeyPartition(k) for k in self.keys]

    def read(self, partition: KeyPartition):
        client = MockPagedClient(
            page_size=int(self.options.get("page_size", 5)),
            max_pages=int(self.options.get("max_pages", 3)),
            missing=frozenset(
                m
                for m in self.options.get("missing", "").split(",")
                if m
            ),
        )
        policy = RetryPolicy()
        key = partition.key
        token: str | None = None
        while True:
            try:
                page, token = _with_retry(
                    lambda: client.fetch_page(key, token), policy
                )
            except DomainSkipError:
                return  # S15: skip the key, keep the scan
            for row in page:
                yield (key, row["item_id"], row["value"])
            if not token:
                return


class PagedApiDataSource(DataSource):
    """format("paged_api") — register with
    spark.dataSource.register(PagedApiDataSource)."""

    @classmethod
    def name(cls) -> str:
        return "paged_api"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema) -> PagedApiReader:
        return PagedApiReader(self.options)


# ---------------------------------------------------------------------------
# Streaming variant: each microbatch ingests ONE page number across all
# keys (the Structured-Streaming form of the reference's one-day-per-run
# incremental loop, /root/reference/main.py:213-224 — progress tracked in
# the offset log instead of a watermark table).
# ---------------------------------------------------------------------------

from pyspark.sql.datasource import SimpleDataSourceStreamReader  # noqa: E402


class PagedApiStreamReader(SimpleDataSourceStreamReader):
    """simpleStreamReader: offsets are {"page": p} (1-based next page
    to ingest). read(start) pulls page p for every key that has one;
    when all chains are exhausted the offset stops advancing and
    microbatches come back empty. readBetweenOffsets replays
    deterministically from the mock (same page -> same rows), which is
    what makes recovery exactly-once."""

    def __init__(self, options: dict):
        keys_opt = options.get("keys", "")
        self.keys = [k.strip() for k in keys_opt.split(",") if k.strip()]
        self.client = MockPagedClient(
            page_size=int(options.get("page_size", 5)),
            max_pages=int(options.get("max_pages", 3)),
            fail_every=0,
            ratelimit_every=0,
        )

    def initialOffset(self) -> dict:
        return {"page": 1}

    def _rows_for_page(self, page_no: int) -> list:
        # materialized list, not a generator: the simple stream reader's
        # rows are pickled driver-side for prefetch/replay
        out = []
        for key in self.keys:
            if page_no <= self.client.pages_for(key):
                rows, _ = self.client.fetch_page(key, str(page_no))
                out.extend((key, r["item_id"], r["value"]) for r in rows)
        return out

    def read(self, start: dict):
        page_no = start["page"]
        max_chain = max((self.client.pages_for(k) for k in self.keys), default=0)
        if page_no > max_chain:  # caught up: empty batch, same offset
            return iter([]), start
        return iter(self._rows_for_page(page_no)), {"page": page_no + 1}

    def readBetweenOffsets(self, start: dict, end: dict):
        rows = []
        for p in range(start["page"], end["page"]):
            rows.extend(self._rows_for_page(p))
        return iter(rows)

    def commit(self, end: dict) -> None:
        pass  # mock source has nothing to clean up


class PagedApiStreamDataSource(DataSource):
    """format("paged_api_stream") — spark.readStream.format(...)."""

    @classmethod
    def name(cls) -> str:
        return "paged_api_stream"

    def schema(self) -> str:
        return SCHEMA_DDL

    def simpleStreamReader(self, schema) -> PagedApiStreamReader:
        return PagedApiStreamReader(self.options)
