"""Record → LLM document rendering.

Parity with the reference's ``DocumentRenderer``
(``airbyte/_util/document_rendering.py:37-94``) and the ``Document``
model (``airbyte/documents.py:29-57``): a record becomes markdown with
an H1 title (title properties), YAML-ish frontmatter (metadata
properties), H2 sections per content property, and a metadata dict.

Spark-first: rendering is a single ``select`` of JVM-side string
expressions (``concat_ws`` / ``format_string``) — no Python UDF, so the
render stays inside whole-stage codegen even over billions of rows.
Title-casing uses a real UDF-free approach: ``initcap`` matches the
reference's ``_to_title_case`` for the common case of
lowercase/underscore field names.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def title_case_expr(name: str) -> str:
    """'user_name' → 'User Name' (reference document_rendering.py:18-24)."""
    return " ".join(w.capitalize() for w in name.replace("_", " ").split())


def render_documents(
    df: DataFrame,
    *,
    title_properties: list[str] | None = None,
    content_properties: list[str] | None = None,
    metadata_properties: list[str] | None = None,
    render_metadata: bool = False,
) -> DataFrame:
    """Project records into (id, content, metadata) documents.

    Output schema: ``id string, content string, metadata string(JSON)``.
    """
    title_properties = title_properties or []
    metadata_properties = metadata_properties or []
    if content_properties is None:
        content_properties = [
            c
            for c in df.columns
            if c not in set(title_properties) | set(metadata_properties)
            and not c.startswith("_airbyte_")
        ]

    parts: list[Column] = []
    if title_properties:
        title = F.concat_ws(
            " ", *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in title_properties]
        )
        parts.append(F.concat(F.lit("# "), title))
    if render_metadata and metadata_properties:
        fm_lines = [
            F.concat(F.lit(f"{c}: "), F.coalesce(F.col(c).cast("string"), F.lit("")))
            for c in metadata_properties
        ]
        parts.append(F.concat_ws("\n", F.lit("---"), *fm_lines, F.lit("---")))
    for c in content_properties:
        parts.append(
            F.concat(
                F.lit(f"## {title_case_expr(c)}\n\n"),
                F.coalesce(F.col(c).cast("string"), F.lit("")),
            )
        )

    content = F.concat_ws("\n\n", *parts)
    doc_id = (
        F.concat_ws("-", *[F.col(c).cast("string") for c in title_properties])
        if title_properties
        else F.md5(content)
    )
    metadata = (
        F.to_json(F.struct(*[F.col(c) for c in metadata_properties]))
        if metadata_properties
        else F.lit("{}")
    )
    return df.select(
        doc_id.alias("id"), content.alias("content"), metadata.alias("metadata")
    )


class Document:
    """A rendered document projection of a record (reference
    ``airbyte/documents.py:29-60``): id, content, metadata,
    last_modified. Duck-typed to LangChain's ``Document`` via
    ``page_content``. The Spark-side rendering path
    (:func:`render_documents`) produces these shapes as DataFrame
    columns; this class is the row-level container for driver-side
    consumers."""

    def __init__(
        self,
        *,
        content: str,
        id: str | None = None,  # noqa: A002 - reference field name
        metadata: dict | None = None,
        last_modified=None,
    ) -> None:
        self.id = id
        self.content = content
        self.metadata = metadata or {}
        self.last_modified = last_modified

    def __str__(self) -> str:
        return self.content

    @property
    def page_content(self) -> str:
        """LangChain duck-type alias for ``content``."""
        return self.content
