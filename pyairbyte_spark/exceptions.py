"""Structured error hierarchy mirroring the reference's exception design.

The reference (``airbyte/exceptions.py:66-190``) builds every error from a
dataclass base whose ``__str__`` renders the docstring-derived message plus
optional ``guidance``, ``help_url`` and a ``context`` dict of properties —
so failures are self-describing without the caller formatting anything.
This module reproduces that contract with the same class names users of
the reference already catch, so `except` blocks port unchanged.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

DOCS_URL = "https://spark.apache.org/docs/latest/api/python/"


@dataclass(kw_only=True)
class PyAirbyteError(Exception):
    """Base for all engine errors (reference ``exceptions.py:66-188``).

    The message renders as: docstring first line, then guidance, help URL,
    and each context key on its own line — matching the reference's
    ``__str__`` at ``exceptions.py:100-139``.
    """

    guidance: str | None = None
    help_url: str | None = None
    log_text: str | list[str] | None = None
    context: dict[str, Any] = field(default_factory=dict)
    message: str | None = None

    def get_message(self) -> str:
        if self.message:
            return self.message
        if self.__doc__:
            return self.__doc__.split("\n", maxsplit=1)[0]
        return "An error occurred."

    _BASE_FIELDS = frozenset(
        {"guidance", "help_url", "log_text", "context", "message"}
    )

    def __str__(self) -> str:
        parts = [self.get_message()]
        if self.guidance:
            parts.append(f"    {self.guidance}")
        if self.help_url:
            parts.append(f"    More info: {self.help_url}")
        # Subclass-specific fields render alongside explicit context —
        # the reference folds all extra properties into the display the
        # same way (exceptions.py:85-116).
        import dataclasses

        extras = {
            f.name: getattr(self, f.name)
            for f in dataclasses.fields(self)
            if f.name not in self._BASE_FIELDS and getattr(self, f.name) is not None
        }
        for key, value in {**extras, **self.context}.items():
            parts.append(f"    {key}: {value!r}")
        if self.log_text:
            text = (
                "\n".join(self.log_text)
                if isinstance(self.log_text, list)
                else self.log_text
            )
            parts.append(f"    Log output:\n{text}")
        return "\n".join(parts)

    def __repr__(self) -> str:
        return f"{self.__class__.__name__}({self.get_message()!r})"


# -- internal / input ------------------------------------------------------


@dataclass(kw_only=True)
class PyAirbyteInternalError(PyAirbyteError):
    """An internal error occurred in the engine."""

    guidance: str | None = "Please consider reporting this error."


@dataclass(kw_only=True)
class PyAirbyteInputError(PyAirbyteError, ValueError):
    """The input provided is invalid."""

    guidance: str | None = "Please check the provided value and try again."
    help_url: str | None = DOCS_URL
    input_value: str | None = None


@dataclass(kw_only=True)
class PyAirbyteNoStreamsSelectedError(PyAirbyteInputError):
    """No streams were selected for the source."""

    guidance: str | None = (
        "Call `select_streams()` or `select_all_streams()` before reading."
    )
    connector_name: str | None = None
    available_streams: list[str] | None = None


# -- normalization / types -------------------------------------------------


@dataclass(kw_only=True)
class PyAirbyteNameNormalizationError(PyAirbyteError, ValueError):
    """Error occurred while normalizing a table or column name."""

    guidance: str | None = (
        "Please consider renaming the source object so it can be normalized."
    )
    raw_name: str | None = None
    normalization_result: str | None = None


@dataclass(kw_only=True)
class PyAirbyteTypeError(PyAirbyteError, TypeError):
    """Could not convert a JSON-Schema type declaration to a Spark type."""

    json_schema_property_def: dict[str, Any] | None = None


# -- cache -----------------------------------------------------------------


@dataclass(kw_only=True)
class PyAirbyteCacheError(PyAirbyteError):
    """Error occurred while accessing the cache."""

    cache_name: str | None = None
    table_name: str | None = None


@dataclass(kw_only=True)
class PyAirbyteCacheTableValidationError(PyAirbyteCacheError):
    """Cache table validation failed."""

    violation: str | None = None


# -- connectors ------------------------------------------------------------


@dataclass(kw_only=True)
class AirbyteConnectorError(PyAirbyteError):
    """Error occurred while executing the connector."""

    connector_name: str | None = None


@dataclass(kw_only=True)
class AirbyteConnectorExecutableNotFoundError(AirbyteConnectorError):
    """Connector executable not found."""


@dataclass(kw_only=True)
class AirbyteConnectorReadError(AirbyteConnectorError):
    """Error occurred while reading from the connector."""


@dataclass(kw_only=True)
class AirbyteConnectorWriteError(AirbyteConnectorError):
    """Error occurred while writing to the connector."""


@dataclass(kw_only=True)
class AirbyteConnectorCheckFailedError(AirbyteConnectorError):
    """The connector `check` operation failed."""

    guidance: str | None = (
        "Please double-check your config or review the connector's logs."
    )


@dataclass(kw_only=True)
class AirbyteConnectorDiscoverFailedError(AirbyteConnectorError):
    """The connector `discover` operation failed."""


@dataclass(kw_only=True)
class AirbyteConnectorFailedError(AirbyteConnectorError):
    """The connector process failed."""

    exit_code: int | None = None


@dataclass(kw_only=True)
class AirbyteStreamNotFoundError(AirbyteConnectorError):
    """The stream was not found in the connector's catalog."""

    stream_name: str | None = None
    available_streams: list[str] | None = None


@dataclass(kw_only=True)
class AirbyteConnectorInstallationError(AirbyteConnectorError):
    """Installing the connector into its virtual environment failed
    (reference ``exceptions.py`` same-named class; raised by the venv
    executor on venv-create / pip-install / version-enforcement
    failures)."""

    guidance: str | None = (
        "Check the pip error output; pass `pip_url=` to install from a "
        "different package source, or `local_executable=` to skip install."
    )


@dataclass(kw_only=True)
class AirbyteNoDataFromConnectorError(AirbyteConnectorError):
    """No data was returned from the connector (reference
    ``exceptions.py`` same-named class; raised by validate's deep read
    when every stream yields zero records)."""


# -- registry --------------------------------------------------------------


@dataclass(kw_only=True)
class AirbyteConnectorRegistryError(PyAirbyteError):
    """Error occurred while accessing the connector registry."""


@dataclass(kw_only=True)
class AirbyteConnectorNotRegisteredError(AirbyteConnectorRegistryError):
    """The connector is not registered in the connector registry."""

    guidance: str | None = (
        "Pass `local_executable=` or an argv to run an unregistered connector."
    )
    connector_name: str | None = None
    available_connectors: list[str] | None = None


@dataclass(kw_only=True)
class AirbyteDuplicateResourcesError(PyAirbyteError):
    """A uniquely-named resource already exists (reference
    ``exceptions.py`` same-named class; raised by workspace deploys with
    ``unique=True``)."""

    resource_type: str | None = None
    resource_name: str | None = None


# -- secrets ---------------------------------------------------------------


@dataclass(kw_only=True)
class PyAirbyteSecretNotFoundError(PyAirbyteError):
    """Secret not found in any of the configured secret sources."""

    guidance: str | None = "Please ensure that the secret is set."
    secret_name: str | None = None
    sources: list[str] | None = None


# -- SQL guard -------------------------------------------------------------


@dataclass(kw_only=True)
class PyAirbyteUnsafeSQLError(PyAirbyteInputError):
    """The SQL statement was rejected by the safety guard."""

    guidance: str | None = (
        "Only single-statement SELECT / DESCRIBE / SHOW / EXPLAIN is allowed."
    )
    sql: str | None = None
