"""Small host-side utilities: YAML, logging, progress bars.

Equivalent of the reference's utils (src/flashmd/utils.py — ruamel YAML +
notebook-aware tqdm) and its loguru logging setup
(src/flashmd/simulation/logging.py:15-101), built on stdlib logging + pyyaml.
"""

from __future__ import annotations

import logging
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


def setup_logging(
    level: int = logging.INFO, log_file: str | None = None
) -> logging.Logger:
    """Console (+ optional file) logging, loguru-style format."""
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
        fh = logging.FileHandler(log_file)
        fh.setFormatter(
            logging.Formatter(
                "%(asctime)s | %(levelname)s | %(name)s - %(message)s"
            )
        )
        logger.addHandler(fh)
    return logger
