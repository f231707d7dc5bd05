"""Console logging with rich fallback (reference src/utils/rprint.py:8-16)."""

from __future__ import annotations

try:
    from rich.console import Console

    _console = Console()

    def log(*args, style: str | None = None, **kwargs):
        _console.print(*args, style=style, **kwargs)

except Exception:  # pragma: no cover

    def log(*args, style=None, **kwargs):  # noqa: ARG001
        print(*args, **kwargs)
