"""Dual console + file logging.

Equivalent of the reference's per-module logging setup
(``Supervised Learning/Functions.py:53-64``) without its last-importer-wins
``mode='w'`` bug: one idempotent configurator for the package logger.
"""

from __future__ import annotations

import logging


def get_logger(name: str = "forging_control_tpu",
               log_file: str | None = None,
               level: int = logging.INFO) -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(level)
    if not logger.handlers:
        sh = logging.StreamHandler()
        sh.setFormatter(logging.Formatter("%(message)s"))
        logger.addHandler(sh)
    if log_file and not any(
            isinstance(h, logging.FileHandler) and
            getattr(h, "baseFilename", None) == log_file
            for h in logger.handlers):
        fh = logging.FileHandler(log_file, mode="a")
        fh.setFormatter(
            logging.Formatter("%(asctime)s %(levelname)s %(message)s"))
        logger.addHandler(fh)
    return logger
