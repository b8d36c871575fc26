"""Logger (reference mogen/utils/logger.py:1-7)."""

import logging
import sys
from typing import Optional

_LOGGERS = {}


def get_root_logger(log_file: Optional[str] = None, log_level=logging.INFO):
    name = "motioncraft"
    if name in _LOGGERS:
        return _LOGGERS[name]
    logger = logging.getLogger(name)
    logger.setLevel(log_level)
    fmt = logging.Formatter("%(asctime)s - %(name)s - %(levelname)s - %(message)s")
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if log_file:
        fh = logging.FileHandler(log_file)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    _LOGGERS[name] = logger
    return logger
