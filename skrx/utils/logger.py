"""Dual stdout/file logger with ANSI stripping for the file handler.

Capability parity with reference skrec/io/logger.py:14-89.
"""
import logging
import os
import re
import sys

__all__ = ["Logger"]

_ANSI_RE = re.compile(r"\x1b\[[0-9;]*m")


class _StripColorFilter(logging.Filter):
    def filter(self, record: logging.LogRecord) -> bool:
        if isinstance(record.msg, str):
            record.msg = _ANSI_RE.sub("", record.msg)
        return True


class Logger:
    """Logs to stdout (with color) and to a file (colors stripped), flushing
    after every message so progress is visible under buffered redirection."""

    def __init__(self, filename: str):
        self._logger = logging.getLogger(filename)
        self._logger.setLevel(logging.DEBUG)
        self._logger.propagate = False
        self._logger.handlers.clear()

        dirname = os.path.dirname(filename)
        if dirname:
            os.makedirs(dirname, exist_ok=True)

        formatter = logging.Formatter("%(message)s")

        fh = logging.FileHandler(filename, encoding="utf-8")
        fh.setLevel(logging.DEBUG)
        fh.setFormatter(formatter)
        fh.addFilter(_StripColorFilter())
        self._logger.addHandler(fh)

        sh = logging.StreamHandler(sys.stdout)
        sh.setLevel(logging.DEBUG)
        sh.setFormatter(formatter)
        self._logger.addHandler(sh)

    def _flush(self):
        for handler in self._logger.handlers:
            handler.flush()

    def debug(self, msg, *args):
        self._logger.debug(msg, *args)
        self._flush()

    def info(self, msg, *args):
        self._logger.info(msg, *args)
        self._flush()

    def warning(self, msg, *args):
        self._logger.warning(msg, *args)
        self._flush()

    def error(self, msg, *args):
        self._logger.error(msg, *args)
        self._flush()

    def critical(self, msg, *args):
        self._logger.critical(msg, *args)
        self._flush()
