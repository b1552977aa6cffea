"""Singleton logger (console + optional rotating file).

Mirrors the role of the reference's ``utils/logger_utils.py:16``.
"""

from __future__ import annotations

import logging
import os
import sys
from logging.handlers import TimedRotatingFileHandler

from .constants import Constants

_LOGGERS: dict[str, logging.Logger] = {}

_FMT = "%(asctime)s - %(levelname)s - %(name)s - %(filename)s:%(lineno)d - %(message)s"


def get_logger(name: str = "pdf_table_tpu") -> logging.Logger:
    if name in _LOGGERS:
        return _LOGGERS[name]
    lg = logging.getLogger(name)
    lg.setLevel(getattr(logging, Constants.LOG_LEVEL.upper(), logging.INFO))
    lg.propagate = False
    if not lg.handlers:
        sh = logging.StreamHandler(sys.stderr)
        sh.setFormatter(logging.Formatter(_FMT))
        lg.addHandler(sh)
        try:
            os.makedirs(os.path.dirname(Constants.LOG_FILE), exist_ok=True)
            fh = TimedRotatingFileHandler(
                Constants.LOG_FILE, when="midnight", backupCount=7, encoding="utf-8"
            )
            fh.setFormatter(logging.Formatter(_FMT))
            lg.addHandler(fh)
        except OSError:
            pass  # read-only filesystem: console-only logging
    _LOGGERS[name] = lg
    return lg


logger = get_logger()
