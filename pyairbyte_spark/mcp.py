"""MCP (Model Context Protocol) server — reference ``airbyte.mcp``.

Alias module so ``from pyairbyte_spark import mcp`` mirrors the
reference's ``from airbyte import mcp``; the implementation lives in
:mod:`pyairbyte_spark.mcp_server` (stdio JSON-RPC server, local +
cloud + registry tool groups, prompt templates, interactive UI tools).
"""

from __future__ import annotations

from pyairbyte_spark.mcp_server import *  # noqa: F401,F403
