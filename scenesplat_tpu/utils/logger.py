"""Logging utilities (reference: pointcept/utils/logger.py:27-155)."""

from __future__ import annotations

import logging
import os
import sys
from typing import Optional

_LOGGERS = {}


class _ColorFormatter(logging.Formatter):
    COLORS = {
        logging.DEBUG: "\033[37m",
        logging.INFO: "\033[36m",
        logging.WARNING: "\033[33m",
        logging.ERROR: "\033[31m",
        logging.CRITICAL: "\033[41m",
    }
    RESET = "\033[0m"

    def format(self, record):
        msg = super().format(record)
        color = self.COLORS.get(record.levelno, "")
        if color and sys.stderr.isatty():
            return f"{color}{msg}{self.RESET}"
        return msg


def get_root_logger(
    log_file: Optional[str] = None,
    log_level: int = logging.INFO,
    name: str = "scenesplat_tpu",
) -> logging.Logger:
    """Create (once) and return the framework logger."""
    if name in _LOGGERS:
        logger = _LOGGERS[name]
        if log_file is not None and not any(
            isinstance(h, logging.FileHandler) for h in logger.handlers
        ):
            _add_file_handler(logger, log_file, log_level)
        return logger
    logger = logging.getLogger(name)
    logger.setLevel(log_level)
    logger.propagate = False
    fmt = "[%(asctime)s %(levelname)s %(filename)s:%(lineno)d] %(message)s"
    stream = logging.StreamHandler()
    stream.setFormatter(_ColorFormatter(fmt, datefmt="%Y-%m-%d %H:%M:%S"))
    stream.setLevel(log_level)
    logger.addHandler(stream)
    if log_file is not None:
        _add_file_handler(logger, log_file, log_level)
    _LOGGERS[name] = logger
    return logger


def _add_file_handler(logger, log_file, log_level):
    os.makedirs(os.path.dirname(os.path.abspath(log_file)), exist_ok=True)
    fh = logging.FileHandler(log_file, mode="a")
    fh.setFormatter(
        logging.Formatter(
            "[%(asctime)s %(levelname)s %(filename)s:%(lineno)d] %(message)s",
            datefmt="%Y-%m-%d %H:%M:%S",
        )
    )
    fh.setLevel(log_level)
    logger.addHandler(fh)
