"""Root logger with process-0-only INFO.

Mirrors the reference's logger behavior
(``/root/reference/codes/utils/logger.py:9-19``): non-rank-0 processes are
silenced to ERROR. Rank here is ``jax.process_index()``.
"""

from __future__ import annotations

import logging
from typing import Optional

_LOGGER_NAME = 'mvfnet_tpu'
_initialized = False


def _process_index() -> int:
    try:
        import jax
        return jax.process_index()
    except Exception:
        return 0


def get_root_logger(log_level: str = 'INFO',
                    log_file: Optional[str] = None) -> logging.Logger:
    global _initialized
    logger = logging.getLogger(_LOGGER_NAME)
    if _initialized:
        return logger
    level = getattr(logging, log_level) if isinstance(log_level, str) else log_level
    fmt = logging.Formatter(
        '%(asctime)s - %(name)s - %(levelname)s - %(message)s')
    handler = logging.StreamHandler()
    handler.setFormatter(fmt)
    logger.addHandler(handler)
    if log_file is not None and _process_index() == 0:
        fh = logging.FileHandler(log_file)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    if _process_index() != 0:
        logger.setLevel(logging.ERROR)
    else:
        logger.setLevel(level)
    logger.propagate = False
    _initialized = True
    return logger
