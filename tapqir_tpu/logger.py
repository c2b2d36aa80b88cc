"""Colored logging (reference: tapqir/logger.py:9-57)."""

import logging
import sys
from pathlib import Path

try:
    import colorama

    _COLORS = {
        logging.DEBUG: colorama.Fore.CYAN,
        logging.INFO: colorama.Fore.GREEN,
        logging.WARNING: colorama.Fore.YELLOW,
        logging.ERROR: colorama.Fore.RED,
        logging.CRITICAL: colorama.Fore.RED + colorama.Style.BRIGHT,
    }
    _RESET = colorama.Fore.RESET + colorama.Style.RESET_ALL
except ImportError:  # pragma: no cover
    _COLORS = {}
    _RESET = ""


class ColorFormatter(logging.Formatter):
    """Level-colored log formatter."""

    def format(self, record):
        color = _COLORS.get(record.levelno, "")
        msg = super().format(record)
        return f"{color}{record.levelname}{_RESET} - {msg}" if color else msg


def init_logger(workdir: Path, name: str = "tapqir") -> logging.Logger:
    """stdout INFO + ``.tapqir/loginfo`` DEBUG file handler
    (reference: tapqir/main.py:1466-1482)."""
    logger = logging.getLogger(name)
    logger.setLevel(logging.DEBUG)
    logger.handlers.clear()

    ch = logging.StreamHandler(sys.stdout)
    ch.setLevel(logging.INFO)
    ch.setFormatter(ColorFormatter(fmt="%(message)s"))
    logger.addHandler(ch)

    fh = logging.FileHandler(Path(workdir) / ".tapqir" / "loginfo")
    fh.setLevel(logging.DEBUG)
    fh.setFormatter(
        logging.Formatter(
            fmt="%(asctime)s - %(levelname)s - %(message)s",
            datefmt="%m/%d/%Y %I:%M %p",
        )
    )
    logger.addHandler(fh)
    # package loggers propagate into the same handlers
    pkg_logger = logging.getLogger("tapqir_tpu")
    pkg_logger.setLevel(logging.DEBUG)
    pkg_logger.handlers = logger.handlers
    return logger
