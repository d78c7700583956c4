"""Small host-side utilities: YAML, logging, progress bars.

Equivalent of the reference's utils (src/flashmd/utils.py — ruamel YAML +
notebook-aware tqdm) and its loguru logging setup
(src/flashmd/simulation/logging.py:15-101), built on stdlib logging + pyyaml.
"""

from __future__ import annotations

import logging
import logging.handlers
import sys

import yaml

try:
    from tqdm import tqdm  # noqa: F401
except ImportError:  # pragma: no cover
    def tqdm(it, **kwargs):
        return it


def load_yaml(fn):
    with open(fn, "r") as f:
        return yaml.safe_load(f)


def dump_yaml(fn, data):
    with open(fn, "w") as f:
        yaml.safe_dump(data, f, default_flow_style=False, sort_keys=False)


logger = logging.getLogger("flashmd_tpu")


#: File-sink rotation mirroring the reference's loguru setup
#: (src/flashmd/simulation/logging.py:15-101: rotation="100 MB",
#: retention="7 days"). Stdlib logging has no age-based retention, so the
#: 7-day policy maps to keeping 7 rotated generations.
LOG_ROTATE_BYTES = 100 * 1024 * 1024
LOG_BACKUP_COUNT = 7


def setup_logging(
    level: int = logging.INFO,
    log_file: str | None = None,
    rotate_bytes: int = LOG_ROTATE_BYTES,
    backup_count: int = LOG_BACKUP_COUNT,
) -> logging.Logger:
    """Console (+ optional rotating file) logging, loguru-style format."""
    logger.setLevel(level)
    if not any(
        isinstance(h, logging.StreamHandler) for h in logger.handlers
    ):
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(
            logging.Formatter(
                "%(asctime)s | %(levelname)s | %(name)s - %(message)s"
            )
        )
        logger.addHandler(handler)
    if log_file is not None and not any(
        isinstance(h, logging.FileHandler)
        and getattr(h, "baseFilename", None) == log_file
        for h in logger.handlers
    ):
        fh = logging.handlers.RotatingFileHandler(
            log_file, maxBytes=rotate_bytes, backupCount=backup_count
        )
        fh.setFormatter(
            logging.Formatter(
                "%(asctime)s | %(levelname)s | %(name)s - %(message)s"
            )
        )
        logger.addHandler(fh)
    return logger
