"""Minimal dotenv loader (reference credential contract,
/root/reference/README.md:16-17,89-92: "store credentials in a .env file
and load them with dotenv — never hard-code secrets").

Implements the public python-dotenv file format (KEY=VALUE lines,
``export`` prefix, comments, single/double quotes, blank lines) with no
third-party dependency. Values load into ``os.environ`` on the DRIVER
only — exactly where :func:`..sources.rest.read_rest` resolves
``auth_env`` — so secrets never ride into plans, logs, or executor
environments through this path.
"""

from __future__ import annotations

import os

__all__ = ["parse_dotenv", "load_dotenv"]


def parse_dotenv(text: str) -> dict[str, str]:
    """Parse .env file content into a dict (no environment mutation)."""
    out: dict[str, str] = {}
    for raw in text.splitlines():
        line = raw.strip()
        if not line or line.startswith("#") or "=" not in line:
            continue
        if line.startswith("export "):
            line = line[len("export ") :].lstrip()
        key, _, value = line.partition("=")
        key = key.strip()
        if not key or any(ch.isspace() for ch in key):
            continue
        value = value.strip()
        if len(value) >= 2 and value[0] == value[-1] and value[0] in "\"'":
            value = value[1:-1]
        else:
            # Unquoted values: strip trailing inline comment.
            hash_pos = value.find(" #")
            if hash_pos != -1:
                value = value[:hash_pos].rstrip()
        out[key] = value
    return out


def load_dotenv(path: str = ".env", override: bool = False) -> dict[str, str]:
    """Load ``path`` into ``os.environ``; returns the parsed mapping.

    Missing file is a no-op (same contract as python-dotenv): deployments
    that inject real env vars need no file. Existing variables win unless
    ``override=True`` — a live environment outranks a checked-in file.
    """
    if not os.path.exists(path):
        return {}
    with open(path, encoding="utf-8") as fh:
        values = parse_dotenv(fh.read())
    for key, value in values.items():
        if override or key not in os.environ:
            os.environ[key] = value
    return values
