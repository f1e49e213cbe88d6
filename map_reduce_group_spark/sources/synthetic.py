"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API): a
deterministic synthetic-corpus generator — the "infinite test fixture"
source a data-pipeline team uses to smoke a 100 TB job shape without
storing 100 TB. Demonstrates the engine's source EXTENSIBILITY beyond the
built-in formats (SURVEY §2B sources): the same scan surface (schema,
partitioned parallel reads, filter pushdown) implemented in ~100 lines of
Python.

Scale design:
- **Partition-parallel**: `n_docs` splits into `n_partitions` contiguous
  doc_id ranges; each executor task generates only its range. No driver
  materialization, no shuffle — generation cost is O(n_docs / partitions)
  per task, so the source scales linearly with executors.
- **Arrow batches**: `read()` yields pyarrow RecordBatches (the vectorized
  path), not per-row tuples.
- **Filter pushdown** (`pushFilters`): doc_id range predicates narrow the
  partition ranges BEFORE tasks launch — the custom-source analog of
  parquet min/max pruning; a `doc_id < k` probe scan does O(k) work total
  regardless of `n_docs`. Non-range filters are returned unhandled and
  Spark re-applies them post-scan (correctness never depends on pruning).
- **Deterministic**: content is a pure function of (doc_id, seed) via md5,
  so any two scans — any partitioning, any cluster size — produce the
  identical corpus. Seeds the golden tests and makes `EXCEPT`-style
  diff-testing of pipeline changes possible on generated data.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
)

_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars int"

_WORDS = (
    "the data spark shuffle partition broadcast join scan filter corpus "
    "token stream batch vector cluster sample window merge sort hash"
).split()

_LANGS = ("en", "fr", "es", "de")


def _doc(doc_id: int, seed: int) -> tuple[int, str, str, str, int]:
    """Pure function of (doc_id, seed): md5-driven word choices."""
    h = hashlib.md5(f"{seed}:{doc_id}".encode()).digest()
    n_words = 5 + h[0] % 20
    words = [
        _WORDS[hashlib.md5(f"{seed}:{doc_id}:{i}".encode()).digest()[0] % len(_WORDS)]
        for i in range(n_words)
    ]
    text = " ".join(words)
    return (
        doc_id,
        text,
        _LANGS[h[1] % len(_LANGS)],
        f"src{h[2] % 8}",
        len(text),
    )


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int, seed: int):
        self.start, self.end, self.seed = start, end, seed


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_docs = int(options.get("n_docs", 1000))
        self.n_parts = int(options.get("n_partitions", 8))
        self.seed = int(options.get("seed", 0))
        self.lo = 0  # inclusive doc_id lower bound after pushdown
        self.hi = self.n_docs  # exclusive upper bound after pushdown

    def partitions(self) -> Sequence[InputPartition]:
        lo, hi = self.lo, max(self.lo, self.hi)
        n = max(1, min(self.n_parts, hi - lo or 1))
        step = (hi - lo + n - 1) // n if hi > lo else 1
        return [
            _RangePartition(s, min(s + step, hi), self.seed)
            for s in range(lo, hi, step)
        ] or [_RangePartition(0, 0, self.seed)]

    def read(self, partition: _RangePartition):
        import pyarrow as pa

        rows = [_doc(i, partition.seed) for i in range(partition.start, partition.end)]
        if not rows:
            return
        cols = list(zip(*rows))
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(cols[0], pa.int64()),
                pa.array(cols[1], pa.string()),
                pa.array(cols[2], pa.string()),
                pa.array(cols[3], pa.string()),
                pa.array(cols[4], pa.int32()),
            ],
            names=["doc_id", "text", "lang", "source", "n_chars"],
        )


class SyntheticDocsPushdownReader(SyntheticDocsReader):
    """Reader variant with doc_id range pushdown. Split into a subclass
    because Spark refuses ANY reader that defines ``pushFilters`` unless
    ``spark.sql.python.filterPushdown.enabled`` is true — the plain reader
    keeps the source usable on unconfigured sessions (Spark re-applies all
    filters post-scan either way; pushdown only changes the work done)."""

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Absorb doc_id range predicates into the generation bounds (the
        custom-source analog of min/max pruning); yield back everything we
        can't handle so Spark re-applies it post-scan."""
        for f in filters:
            attr = getattr(f, "attribute", None)
            if attr == ("doc_id",):
                if isinstance(f, GreaterThan):
                    self.lo = max(self.lo, f.value + 1)
                    continue
                if isinstance(f, GreaterThanOrEqual):
                    self.lo = max(self.lo, f.value)
                    continue
                if isinstance(f, LessThan):
                    self.hi = min(self.hi, f.value)
                    continue
                if isinstance(f, LessThanOrEqual):
                    self.hi = min(self.hi, f.value + 1)
                    continue
            yield f


class SyntheticDocsStreamReader(SimpleDataSourceStreamReader):
    """Streaming twin: the corpus arrives as an unbounded append stream,
    ``batch_size`` docs per micro-batch. Offsets are doc_id watermarks
    (``{"next": n}``) — replayable: ``readBetweenOffsets`` regenerates any
    offset range bit-identically (generation is a pure function of doc_id),
    which is exactly the contract Structured Streaming needs for
    exactly-once recovery after a checkpoint restore."""

    def __init__(self, options: dict):
        self.batch = int(options.get("batch_size", 100))
        self.max_docs = int(options.get("n_docs", 1000))
        self.seed = int(options.get("seed", 0))

    def initialOffset(self) -> dict:
        return {"next": 0}

    def read(self, start: dict):
        lo = start["next"]
        hi = min(lo + self.batch, self.max_docs)
        return iter([_doc(i, self.seed) for i in range(lo, hi)]), {"next": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([_doc(i, self.seed) for i in range(start["next"], end["next"])])


class SyntheticDocsDataSource(DataSource):
    """``spark.read.format("synthetic_docs").option("n_docs", N).load()``
    after ``spark.dataSource.register(SyntheticDocsDataSource)``; also a
    streaming source via ``spark.readStream.format("synthetic_docs")``."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> SyntheticDocsReader:
        # pushdown needs spark.sql.python.filterPushdown.enabled=true;
        # option("pushdown", "false") opts out for unconfigured sessions
        if self.options.get("pushdown", "true").lower() == "false":
            return SyntheticDocsReader(self.options)
        return SyntheticDocsPushdownReader(self.options)

    def simpleStreamReader(self, schema) -> SyntheticDocsStreamReader:
        return SyntheticDocsStreamReader(self.options)
