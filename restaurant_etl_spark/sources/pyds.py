"""Python Data Source API (Spark 4) — the modern extension seam for
custom sources, demonstrated end-to-end: a deterministic menu-corpus
generator with REAL partition planning (one InputPartition per doc_id
range → parallel executor-side generation, no driver materialization)
and REAL filter pushdown (`pushFilters` absorbs doc_id range predicates
into the partition plan, so pruned ranges are never generated at all —
the Python-source analog of parquet partition pruning).

The reference reads its corpus from a directory (process_menu.py:127);
at 100 TB the equivalent seam is a custom DataSource wrapping whatever
the corpus store is (object store listing, a catalog service, a feed) —
this module is that seam's reference implementation, oracle-checked via
``source_python_datasource`` (DuckDB replays the closed-form corpus from
``range()``).
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
)

CATEGORIES = ("Appetizers", "Mains", "Desserts", "Drinks")

SCHEMA = "doc_id bigint, category string, item_name string, price double"


def corpus_row(doc_id: int) -> tuple[int, str, str, float]:
    """The closed-form corpus row — must stay replayable in ANSI SQL
    (see the source_python_datasource oracle)."""
    return (
        doc_id,
        CATEGORIES[doc_id % 4],
        f"menu item {doc_id}",
        float(doc_id % 500) + (doc_id % 4) * 0.25,
    )


class _Range(InputPartition):
    def __init__(self, lo: int, hi: int) -> None:
        self.lo = lo
        self.hi = hi


class MenuCorpusReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.n = int(options.get("n_docs", "1000"))
        self.rows_per_part = int(options.get("rows_per_partition", "250"))
        self.lo = 0
        self.hi = self.n

    def pushFilters(self, filters):  # noqa: N802 - API name
        """Absorb doc_id range predicates into the partition plan; anything
        else is returned as unsupported and Spark re-applies it post-scan
        (so over-claiming is impossible — same contract as DSv2)."""
        for f in filters:
            attr = getattr(f, "attribute", None)
            if attr == ("doc_id",):
                if isinstance(f, GreaterThanOrEqual):
                    self.lo = max(self.lo, int(f.value))
                    continue
                if isinstance(f, GreaterThan):
                    self.lo = max(self.lo, int(f.value) + 1)
                    continue
                if isinstance(f, LessThan):
                    self.hi = min(self.hi, int(f.value))
                    continue
                if isinstance(f, LessThanOrEqual):
                    self.hi = min(self.hi, int(f.value) + 1)
                    continue
            yield f

    def partitions(self):
        lo, hi, step = self.lo, self.hi, self.rows_per_part
        if hi <= lo:
            return [_Range(0, 0)]
        return [_Range(i, min(i + step, hi)) for i in range(lo, hi, step)]

    def read(self, part: _Range):
        for doc_id in range(part.lo, part.hi):
            yield corpus_row(doc_id)


class MenuCorpusStreamReader(SimpleDataSourceStreamReader):
    """Streaming half of the same source (Spark 4 SimpleDataSourceStream
    Reader): the corpus arrives as an incremental feed, ``rows_per_batch``
    docs per micro-batch, offset = next doc_id. Offsets live in the
    query's checkpoint, so kill-and-resume continues exactly where the
    last COMMITTED batch ended (tests prove no-dup/no-loss), and
    ``readBetweenOffsets`` replays any prefetched-but-uncommitted range
    deterministically after a crash — trivially so here because the feed
    is closed-form in doc_id."""

    def __init__(self, options: dict) -> None:
        self.n = int(options.get("n_docs", "1000"))
        self.batch_rows = int(options.get("rows_per_batch", "100"))

    def initialOffset(self) -> dict:  # noqa: N802 - API name
        return {"pos": 0}

    def read(self, start: dict):
        lo = int(start["pos"])
        hi = min(lo + self.batch_rows, self.n)
        return iter([corpus_row(i) for i in range(lo, hi)]), {"pos": hi}

    def readBetweenOffsets(self, start: dict, end: dict):  # noqa: N802
        return iter([corpus_row(i) for i in range(int(start["pos"]), int(end["pos"]))])


class MenuCorpusDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "menu_corpus"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> MenuCorpusReader:
        return MenuCorpusReader(self.options)

    def simpleStreamReader(self, schema) -> MenuCorpusStreamReader:  # noqa: N802
        return MenuCorpusStreamReader(self.options)


def register_once(spark) -> None:
    """Idempotent per-session registration (re-registering the same name
    is an error in some Spark versions)."""
    key = "_menu_corpus_ds_registered"
    if not getattr(spark, key, False):
        # runtime conf (works under any session, incl. the driver's vanilla
        # one): without it Spark 4 refuses a reader that implements
        # pushFilters rather than silently skipping pushdown
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
        spark.dataSource.register(MenuCorpusDataSource)
        setattr(spark, key, True)
