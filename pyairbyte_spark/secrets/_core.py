"""Secrets management: sources, resolution order, and config hydration.

Re-expresses the reference's ``airbyte/secrets/`` package in one module:

- ``SecretString`` — a str subclass whose repr is always masked
  (``airbyte/secrets/base.py:38-97``).
- ``SecretManager`` ABC + concrete managers for env vars, ``.env`` files and
  interactive prompting (``base.py:146-230``, ``env_vars.py:18-66``,
  ``prompt.py``).
- A registry with priority ordering: registered managers are consulted
  first-to-last, prompt only as a last resort
  (``config.py:13-90``, ``util.py:63-140``).
- Config hydration: any string value (at any nesting depth) starting with
  ``secret_reference::`` is replaced by the named secret's value
  (``hydration.py:20-56``; prefix constant ``constants.py:194``), and
  ``deep_update`` merges a secret config overlay into a plain one
  (``hydration.py:59-74``).

No external secret stores (Colab / GSM) are reachable in this environment;
the ``CustomSecretManager`` subclass seam covers them — identical to how
the reference treats them as pluggable managers.
"""

from __future__ import annotations

import json
import os
import sys
from abc import ABC, abstractmethod
from contextlib import suppress
from copy import deepcopy
from enum import Enum
from pathlib import Path
from typing import Any

from pyairbyte_spark import exceptions as exc

SECRETS_HYDRATION_PREFIX = "secret_reference::"


class SecretSourceEnum(str, Enum):
    ENV = "env"
    DOTENV = "dotenv"
    GOOGLE_COLAB = "google_colab"
    GOOGLE_GSM = "google_gsm"  # not enabled by default (reference parity)
    PROMPT = "prompt"

    def __str__(self) -> str:
        return self.value


class SecretString(str):
    """A string that masks itself in reprs (reference ``base.py:38-97``).

    Printing a dict containing a ``SecretString`` shows ``****``; explicit
    str conversion (f-strings) exposes the value — the reference's
    documented escape hatch.
    """

    __slots__ = ()

    def __repr__(self) -> str:
        return "<SecretString: ****>"

    def __bool__(self) -> bool:
        # Truthy without inspecting contents (reference base.py:81-86).
        return True

    def is_empty(self) -> bool:
        return len(self) == 0

    def is_json(self) -> bool:
        try:
            json.loads(self)
        except Exception:
            return False
        return True

    def parse_json(self) -> dict:
        try:
            return json.loads(self)
        except json.JSONDecodeError as ex:
            raise exc.PyAirbyteInputError(
                message="Failed to parse secret as JSON.",
                context={"Message": ex.msg, "Position": ex.pos},
            ) from None


class SecretManager(ABC):
    """Base for secret stores (reference ``base.py:146-230``)."""

    replace_existing = False
    as_backup = False

    def __init__(self) -> None:
        if not hasattr(self, "name"):
            self.name: str = self.__class__.__name__

    @abstractmethod
    def get_secret(self, secret_name: str) -> SecretString | None: ...

    def __str__(self) -> str:
        return self.name

    def __eq__(self, value: object) -> bool:
        if isinstance(value, SecretManager):
            return self.name == value.name
        if isinstance(value, (str, SecretSourceEnum)):
            return self.name == str(value)
        return super().__eq__(value)

    def __hash__(self) -> int:
        return hash(self.name)


class SecretHandle:
    """Late-bound reference to a secret in a specific manager
    (reference ``base.py`` SecretHandle): fetch on demand, never cache."""

    def __init__(self, parent: SecretManager, secret_name: str) -> None:
        self.parent = parent
        self.secret_name = secret_name

    def get_value(self) -> SecretString:
        value = self.parent.get_secret(self.secret_name)
        if value is None:
            raise exc.PyAirbyteSecretNotFoundError(
                secret_name=self.secret_name, sources=[self.parent.name]
            )
        return SecretString(value)


class EnvVarSecretManager(SecretManager):
    """Environment-variable lookup (reference ``env_vars.py:18-28``)."""

    name = SecretSourceEnum.ENV.value

    def get_secret(self, secret_name: str) -> SecretString | None:
        if secret_name not in os.environ:
            return None
        return SecretString(os.environ[secret_name])


def _parse_dotenv(text: str) -> dict[str, str]:
    """Minimal ``.env`` parser (KEY=VALUE lines, #-comments, quote strip).

    python-dotenv is not baked into this environment; the subset parsed
    here covers the format the reference's DotenvSecretManager reads.
    """
    out: dict[str, str] = {}
    for raw in text.splitlines():
        line = raw.strip()
        if not line or line.startswith("#") or "=" not in line:
            continue
        if line.startswith("export "):
            line = line[len("export ") :]
        key, _, value = line.partition("=")
        value = value.strip()
        if len(value) >= 2 and value[0] == value[-1] and value[0] in "\"'":
            value = value[1:-1]
        out[key.strip()] = value
    return out


class DotenvSecretManager(SecretManager):
    """``.env`` file lookup (reference ``env_vars.py:31-66``)."""

    def __init__(self, dotenv_path: Path | None = None) -> None:
        self.dotenv_path = dotenv_path
        self.name = (
            f"{SecretSourceEnum.DOTENV.value}:{dotenv_path}"
            if dotenv_path
            else SecretSourceEnum.DOTENV.value
        )
        super().__init__()

    def get_secret(self, secret_name: str) -> SecretString | None:
        path = self.dotenv_path or Path(".env")
        try:
            values = _parse_dotenv(Path(path).read_text())
        except OSError:
            return None
        if secret_name not in values:
            return None
        return SecretString(values[secret_name])


class SecretsPrompt(SecretManager):
    """Interactive getpass prompt — last-resort source (reference
    ``prompt.py``); consulted only when ``allow_prompt=True`` and stdin
    is a TTY."""

    name = SecretSourceEnum.PROMPT.value

    def get_secret(self, secret_name: str) -> SecretString | None:
        if not sys.stdin.isatty():
            return None
        import getpass

        with suppress(Exception):
            return SecretString(getpass.getpass(f"Enter the value for '{secret_name}': "))
        return None


# -- registry (reference config.py:13-90) ----------------------------------

_SECRETS_SOURCES: list[SecretManager] = []


def _get_secret_sources() -> list[SecretManager]:
    if not _SECRETS_SOURCES:
        _SECRETS_SOURCES.extend([EnvVarSecretManager(), DotenvSecretManager()])
        if sys.stdin.isatty():
            _SECRETS_SOURCES.append(SecretsPrompt())
    return _SECRETS_SOURCES.copy()


def register_secret_manager(
    secret_manager: SecretManager,
    *,
    as_backup: bool = False,
    replace_existing: bool = False,
) -> None:
    if replace_existing:
        clear_secret_sources()
    if as_backup:
        _SECRETS_SOURCES.append(secret_manager)
    else:
        _get_secret_sources()  # ensure defaults exist before prepending
        _SECRETS_SOURCES.insert(0, secret_manager)


def clear_secret_sources() -> None:
    _SECRETS_SOURCES.clear()


def disable_secret_source(source: SecretManager | SecretSourceEnum | str) -> None:
    _get_secret_sources()
    for existing in list(_SECRETS_SOURCES):
        if existing == source or str(existing) == str(source):
            _SECRETS_SOURCES.remove(existing)


class CustomSecretManager(SecretManager, ABC):
    """Auto-registering base for user secret stores (reference
    ``custom.py:12-60``) — the seam where Colab/GSM-style backends plug in."""

    auto_register = True

    def __init__(self) -> None:
        super().__init__()
        if self.auto_register:
            self.register()

    def register(
        self, *, replace_existing: bool | None = None, as_backup: bool | None = None
    ) -> None:
        register_secret_manager(
            self,
            as_backup=self.as_backup if as_backup is None else as_backup,
            replace_existing=(
                self.replace_existing if replace_existing is None else replace_existing
            ),
        )


# -- resolution (reference util.py:63-140) ----------------------------------


def get_secret(
    secret_name: str,
    /,
    *,
    sources: list[SecretManager | SecretSourceEnum] | None = None,
    default: str | SecretString | None = None,
    allow_prompt: bool = True,
) -> SecretString:
    """Resolve a secret by name across the configured sources, in order.

    Mirrors reference ``util.py:63-140``: a ``secret_reference::`` prefix is
    stripped first (so hydration values can be passed verbatim); the prompt
    source is skipped unless ``allow_prompt``; a default, if given, is
    returned instead of raising.
    """
    if secret_name.startswith(SECRETS_HYDRATION_PREFIX):
        secret_name = secret_name.removeprefix(SECRETS_HYDRATION_PREFIX)

    available = _get_secret_sources()
    if sources is None:
        selected = available
    else:
        selected = []
        for source in sources:
            if isinstance(source, SecretManager):
                selected.append(source)
                continue
            match = next((m for m in available if m == source), None)
            if match is None:
                raise exc.PyAirbyteInputError(
                    message="Invalid secret source name.",
                    input_value=str(source),
                )
            selected.append(match)

    if not allow_prompt:
        selected = [m for m in selected if str(m) != SecretSourceEnum.PROMPT.value]
    else:
        # Prompt is always consulted last, regardless of registry position.
        selected.sort(key=lambda m: str(m) == SecretSourceEnum.PROMPT.value)

    for manager in selected:
        value = manager.get_secret(secret_name)
        if value is not None:
            return SecretString(value)

    if default is not None:
        return SecretString(default)

    raise exc.PyAirbyteSecretNotFoundError(
        secret_name=secret_name, sources=[str(m) for m in selected]
    )


def try_get_secret(
    secret_name: str,
    /,
    default: str | SecretString | None = None,
    sources: list[SecretManager | SecretSourceEnum] | None = None,
) -> SecretString | None:
    with suppress(exc.PyAirbyteSecretNotFoundError):
        return get_secret(
            secret_name, sources=sources, allow_prompt=False, default=default
        )
    return None


def is_secret_available(secret_name: str) -> bool:
    return try_get_secret(secret_name) is not None


# -- hydration (reference hydration.py:20-74) --------------------------------


def _hydrate_recursive(config: dict) -> None:
    for key, value in config.items():
        if isinstance(value, dict):
            _hydrate_recursive(value)
        elif isinstance(value, list):
            for item in value:
                if isinstance(item, dict):
                    _hydrate_recursive(item)
        elif isinstance(value, str) and value.startswith(SECRETS_HYDRATION_PREFIX):
            config[key] = get_secret(value, allow_prompt=False)


def hydrate_secrets(config: dict) -> dict:
    """Return a copy of ``config`` with every ``secret_reference::NAME``
    string replaced by the resolved secret (reference ``hydration.py:40-56``)."""
    result = deepcopy(config)
    _hydrate_recursive(result)
    return result


def deep_update(target: dict, source: dict) -> None:
    """Recursively merge ``source`` into ``target`` — keep non-secret config
    in source control, overlay secrets at runtime (``hydration.py:59-74``)."""
    for key, value in source.items():
        if isinstance(value, dict) and isinstance(target.get(key), dict):
            deep_update(target[key], value)
        else:
            target[key] = value
