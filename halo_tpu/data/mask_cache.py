"""In-process active-mask cache: the single-host fast path.

SURVEY.md §2.2 names two TPU-native options for the reference's
filesystem mask side-channel: (a) device/host-resident mask state for
single-host runs, (b) the file protocol for multi-host fidelity. This
module implements (a) ON TOP OF (b): the acquisition round publishes each
updated mask/indicator here before the asynchronous file write lands, and
dataloader workers consult the cache first — so freshly selected labels
are visible to the very next batch with zero PNG decode, while the files
on disk remain the durable, resumable, multi-host-visible source of truth
(reference behavior: cityscapes.py:232-251 re-reads from disk always).

Keys are the artifact paths themselves (mask PNG / indicator file), so
the cache is exactly a write-through layer over the file protocol. A
process that never writes (other hosts, a later resume) simply misses and
falls back to disk.
"""

from __future__ import annotations

import threading
from typing import Dict, Optional

import numpy as np

_lock = threading.Lock()
_masks: Dict[str, np.ndarray] = {}
_indicators: Dict[str, Dict[str, np.ndarray]] = {}


def put_mask(path: str, mask: np.ndarray):
    with _lock:
        _masks[path] = np.asarray(mask, np.uint8)


def get_mask(path: str) -> Optional[np.ndarray]:
    with _lock:
        return _masks.get(path)


def put_indicator(path: str, indicator: Dict[str, np.ndarray]):
    with _lock:
        _indicators[path] = {k: np.asarray(v) for k, v in indicator.items()}


def get_indicator(path: str) -> Optional[Dict[str, np.ndarray]]:
    with _lock:
        return _indicators.get(path)


def clear():
    with _lock:
        _masks.clear()
        _indicators.clear()
