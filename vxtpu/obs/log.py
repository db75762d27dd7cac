"""Leveled logging (the reference's ``Logger`` C14: console + file with
file/line — SURVEY.md §3). Multi-host aware: host 0 logs to console, every
host logs to its own file."""

from __future__ import annotations

import logging
import os
import sys

_FMT = "%(asctime)s %(levelname).1s %(filename)s:%(lineno)d] %(message)s"


def get_logger(name: str = "vxtpu", log_dir: str | None = None,
               level: int = logging.INFO) -> logging.Logger:
    logger = logging.getLogger(name)
    if logger.handlers:
        return logger
    logger.setLevel(level)
    logger.propagate = False
    try:
        import jax
        pid = jax.process_index()
    except Exception:
        pid = 0
    if pid == 0:
        h = logging.StreamHandler(sys.stderr)
        h.setFormatter(logging.Formatter(_FMT))
        logger.addHandler(h)
    if log_dir:
        os.makedirs(log_dir, exist_ok=True)
        fh = logging.FileHandler(os.path.join(log_dir, f"vxtpu_host{pid}.log"))
        fh.setFormatter(logging.Formatter(_FMT))
        logger.addHandler(fh)
    if not logger.handlers:  # non-zero host without log_dir: swallow
        logger.addHandler(logging.NullHandler())
    return logger
