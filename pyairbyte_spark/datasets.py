"""Dataset query surface.

Parity map (reference → here):

- ``CachedDataset`` (SELECT * over a stream's table,
  ``airbyte/datasets/_sql.py:149-180``) → ``CachedDataset`` wrapping a
  lazily-read DataFrame.
- ``SQLDataset.with_filter(*exprs)`` (conjunctive, lazy, chainable;
  ``_sql.py:118-141``) → ``.filter`` chaining — Catalyst composes the
  predicates and pushes them into the parquet scan.
- ``len(dataset)`` = memoized COUNT (``_sql.py:96-106``) → ``df.count()``
  memoized.
- ``to_pandas`` / ``to_arrow`` (chunked, 100k rows/batch;
  ``airbyte/caches/base.py:283-322``) → ``toPandas`` / Arrow batches.
- ``to_documents`` (``datasets/_base.py:57-79``) → documents.render.
- ``LazyDataset`` (live iterator, ``_lazy.py:21-74``) and
  ``InMemoryDataset`` (``_inmemory.py:19-44``) → thin equivalents.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pyairbyte_spark.constants import DEFAULT_ARROW_MAX_CHUNK_SIZE
from pyairbyte_spark.documents import render_documents


class DatasetBase:
    """Common lazy-dataset behavior over a Spark DataFrame."""

    def __init__(self, df: DataFrame, stream_name: str | None = None) -> None:
        self._df = df
        self._stream_name = stream_name
        self._count: int | None = None

    @property
    def stream_name(self) -> str | None:
        return self._stream_name

    @property
    def column_names(self) -> list[str]:
        return list(self._df.columns)

    def to_spark(self) -> DataFrame:
        """Escape hatch (reference ``to_sql_table``, ``_sql.py:207-209``)."""
        return self._df

    def __len__(self) -> int:
        if self._count is None:
            self._count = self._df.count()
        return self._count

    def __iter__(self) -> Iterator[dict[str, Any]]:
        for row in self._df.toLocalIterator():
            yield row.asDict()

    def to_pandas(self):
        return self._df.toPandas()

    def to_arrow(self, *, max_chunk_size: int = DEFAULT_ARROW_MAX_CHUNK_SIZE):
        """Arrow table, re-chunked to ≤ max_chunk_size record batches."""
        table = self._df.toArrow()
        if max_chunk_size:
            table = table.combine_chunks()
            import pyarrow as pa

            batches = table.to_batches(max_chunksize=max_chunk_size)
            table = pa.Table.from_batches(batches, schema=table.schema)
        return table

    def to_documents(
        self,
        title_properties: list[str] | None = None,
        content_properties: list[str] | None = None,
        metadata_properties: list[str] | None = None,
        *,
        render_metadata: bool = False,
    ) -> DataFrame:
        return render_documents(
            self._df,
            title_properties=title_properties,
            content_properties=content_properties,
            metadata_properties=metadata_properties,
            render_metadata=render_metadata,
        )


class SQLDataset(DatasetBase):
    """Lazy, filterable dataset (reference ``SQLDataset``)."""

    def with_filter(self, *filter_exprs: str | Column) -> SQLDataset:
        """Conjunctive (AND) predicates; strings parsed as SQL exprs.

        Lazy and chainable: each call returns a NEW dataset; nothing
        executes until an action (parity: ``_sql.py:118-141``).
        """
        df = self._df
        for e in filter_exprs:
            df = df.filter(F.expr(e) if isinstance(e, str) else e)
        return SQLDataset(df, self._stream_name)

    def select_columns(self, *columns: str) -> SQLDataset:
        return SQLDataset(self._df.select(*columns), self._stream_name)

    def with_display_names(
        self, name_map: dict[str, str] | None = None
    ) -> SQLDataset:
        """Rename normalized columns back to their declared ("pretty")
        casing — the reference's ``to_display_case`` round-trip
        (``airbyte/records.py:149-154``). ``name_map`` is
        {normalized: original}; CachedDataset supplies it from the
        stream's registered schema when omitted. Unknown columns
        (including the internal ``_airbyte_*`` ones) keep their names.
        """
        name_map = name_map or getattr(self, "_display_name_map", None) or {}
        renamed = [name_map.get(c, c) for c in self._df.columns]
        return SQLDataset(self._df.toDF(*renamed), self._stream_name)


class CachedDataset(SQLDataset):
    """SELECT * over a cached stream table (reference ``CachedDataset``)."""

    def __init__(self, df, stream_name=None, *, display_name_map=None):
        super().__init__(df, stream_name)
        self._display_name_map = display_name_map or {}


class InMemoryDataset(DatasetBase):
    """Records held in memory (reference ``_inmemory.py:19-44``)."""

    def __init__(self, spark, records: list[dict[str, Any]], stream_name: str | None = None):
        import pandas as pd

        df = spark.createDataFrame(pd.DataFrame(records))
        super().__init__(df, stream_name)
        self._records = records

    def __iter__(self) -> Iterator[dict[str, Any]]:
        return iter(self._records)

    def __len__(self) -> int:
        return len(self._records)


class LazyDataset:
    """Live iterator over records from a running source — the one
    dataset that is NOT DataFrame-backed (reference ``_lazy.py:21-74``).
    """

    def __init__(self, iterator: Iterator[dict[str, Any]], stream_name: str | None = None,
                 on_close=None) -> None:
        self._iterator = iterator
        self._stream_name = stream_name
        self._on_close = on_close

    @property
    def stream_name(self) -> str | None:
        return self._stream_name

    def __iter__(self) -> Iterator[dict[str, Any]]:
        return self._iterator

    def __next__(self) -> dict[str, Any]:
        return next(self._iterator)

    def close(self) -> None:
        if self._on_close:
            self._on_close()


class DatasetMap(dict):
    """A generic mapping of stream name → dataset (reference
    ``airbyte/datasets/_map.py:19-32``). ``ReadResult``/``SparkCache``
    already behave as mappings; this class exists for API parity and as
    a simple container when composing datasets by hand."""

    def __init__(self, datasets: dict[str, DatasetBase] | None = None) -> None:
        super().__init__(datasets or {})
