"""S11 log-sink parity: the reference's logging configuration
(modules/utils/logger.py:11-77) re-expressed for the engine — same
observable behavior, driver-side (executors log through Spark's own
log4j; this shapes the DRIVER/application log the way wormpy does):

- simple format ``%(asctime)s - %(name)s - %(levelname)s - %(message)s``
  (logger.py:11-13)
- JSON formatter emitting {timestamp, level, module, message
  [, exception]} (logger.py:15-25)
- sensitive-pattern masking: every occurrence replaced by '*' of the
  same length, applied on every handler (logger.py:27-37,72-75)
- rotating file handler: 10 MB / 5 backups defaults (logger.py:39-43)
- replaces existing root handlers, console on stdout (logger.py:47-60)
"""

from __future__ import annotations

import json
import logging
import os
import sys
from logging.handlers import RotatingFileHandler

SIMPLE_FORMAT = "%(asctime)s - %(name)s - %(levelname)s - %(message)s"


class JsonLogFormatter(logging.Formatter):
    """logger.py:15-25 record shape."""

    def format(self, record: logging.LogRecord) -> str:
        out = {
            "timestamp": self.formatTime(record, self.datefmt),
            "level": record.levelname,
            "module": record.module,
            "message": record.getMessage(),
        }
        if record.exc_info:
            out["exception"] = self.formatException(record.exc_info)
        return json.dumps(out)


class MaskingFilter(logging.Filter):
    """logger.py:27-37: each sensitive pattern → '*' * len(pattern)."""

    def __init__(self, patterns: list[str]):
        super().__init__()
        self.patterns = list(patterns)

    def filter(self, record: logging.LogRecord) -> bool:
        msg = record.getMessage()
        for p in self.patterns:
            msg = msg.replace(p, "*" * len(p))
        record.msg = msg
        record.args = None
        return True


def configure_logging(
    log_level: str = "INFO",
    log_file: str | None = None,
    max_file_size: int = 10 * 1024 * 1024,
    backup_count: int = 5,
    sensitive_patterns: list[str] | None = None,
    use_json: bool = False,
    logger: logging.Logger | None = None,
) -> logging.Logger:
    """logger.py:39-77 behavior; ``logger`` override keeps tests off
    the root logger."""
    target = logger if logger is not None else logging.getLogger()
    target.setLevel(log_level)
    for h in target.handlers[:]:
        target.removeHandler(h)

    formatter: logging.Formatter = (
        JsonLogFormatter() if use_json else logging.Formatter(SIMPLE_FORMAT)
    )
    console = logging.StreamHandler(sys.stdout)
    console.setFormatter(formatter)
    target.addHandler(console)

    if log_file:
        os.makedirs(os.path.dirname(log_file), exist_ok=True)
        fh = RotatingFileHandler(
            log_file, maxBytes=max_file_size, backupCount=backup_count
        )
        fh.setFormatter(formatter)
        target.addHandler(fh)

    if sensitive_patterns:
        mask = MaskingFilter(sensitive_patterns)
        for h in target.handlers:
            h.addFilter(mask)
    return target
