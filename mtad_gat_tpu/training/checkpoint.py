"""Checkpointing.

The reference only pickles ``model.state_dict()`` per epoch (training.py:231-241)
— optimizer state and epoch counter are not saved, so there is no true resume
(SURVEY.md §5). Here a checkpoint is the full train state: params, optimizer
state, epoch, and PRNG key, serialized with flax msgpack. ``model.msgpack``
(params only) mirrors the reference's ``model.pt`` role for inference reload.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import flax.serialization as fser


def save_checkpoint(path: str, tree: Any) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(fser.to_bytes(tree))


def load_checkpoint(path: str, target: Any) -> Any:
    with open(path, "rb") as f:
        return fser.from_bytes(target, f.read())
