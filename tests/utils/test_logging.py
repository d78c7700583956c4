"""Rotating file sink (reference: src/flashmd/simulation/logging.py:15-101
rotates at 100 MB with 7-day retention; here size rotation + 7 kept
generations)."""

import logging
import logging.handlers

from flashmd_tpu.utils.io import logger, setup_logging


def _teardown(log_file):
    for h in list(logger.handlers):
        if getattr(h, "baseFilename", None) == str(log_file):
            logger.removeHandler(h)
            h.close()


def test_file_sink_rotates(tmp_path):
    log_file = str(tmp_path / "sim_log.txt")
    setup_logging(log_file=log_file, rotate_bytes=512, backup_count=3)
    try:
        fhs = [
            h
            for h in logger.handlers
            if getattr(h, "baseFilename", None) == log_file
        ]
        assert len(fhs) == 1
        assert isinstance(fhs[0], logging.handlers.RotatingFileHandler)
        for i in range(100):
            logger.info("filler line %04d to push past the rotate size", i)
        rotated = list(tmp_path.glob("sim_log.txt.*"))
        assert rotated, "expected at least one rotated generation"
        assert len(rotated) <= 3
    finally:
        _teardown(log_file)


def test_setup_logging_is_idempotent(tmp_path):
    log_file = str(tmp_path / "sim_log.txt")
    setup_logging(log_file=log_file)
    setup_logging(log_file=log_file)
    try:
        fhs = [
            h
            for h in logger.handlers
            if getattr(h, "baseFilename", None) == log_file
        ]
        assert len(fhs) == 1
    finally:
        _teardown(log_file)
