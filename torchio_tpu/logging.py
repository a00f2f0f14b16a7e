"""Library logging: silent by default, opt-in via enable_logging.

Parity reference: ``/root/reference/src/torchio/logging.py`` (loguru,
disabled by default, RichHandler opt-in). Implemented on stdlib logging
since loguru is not a dependency here.
"""

from __future__ import annotations

import logging as _logging

logger = _logging.getLogger("torchio_tpu")
logger.addHandler(_logging.NullHandler())


def enable_logging(level: str | int = "INFO", rich: bool = True) -> None:
    """Turn on torchio_tpu log output (optionally with rich formatting)."""
    logger.setLevel(level)
    for handler in list(logger.handlers):
        if not isinstance(handler, _logging.NullHandler):
            logger.removeHandler(handler)
    handler: _logging.Handler
    if rich:
        try:
            from rich.logging import RichHandler

            handler = RichHandler(rich_tracebacks=True)
        except ImportError:  # pragma: no cover
            handler = _logging.StreamHandler()
    else:
        handler = _logging.StreamHandler()
    handler.setLevel(level)
    logger.addHandler(handler)


def disable_logging() -> None:
    """Restore the library-default silence."""
    for handler in list(logger.handlers):
        if not isinstance(handler, _logging.NullHandler):
            logger.removeHandler(handler)
    logger.setLevel(_logging.WARNING)
