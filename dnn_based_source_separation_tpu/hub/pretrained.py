"""build_from_pretrained with a pluggable fetcher.

Capability parity: the reference's hub path
(`src/models/conv_tasnet.py:238-310` build_from_pretrained +
`src/utils/utils.py:36-47` gdown download). This container has zero egress,
so instead of hard-wiring Google Drive, the fetcher is pluggable: pass a
callable `(task, sample_rate, n_sources, model_choice) -> local .pth path`
(or point `root` at a directory of already-downloaded reference
checkpoints, laid out `<root>/<task>/sr<sr>/<n>speakers/<choice>.pth` like
the reference's download layout). The checkpoint converts through
hub.torch_convert.
"""
from __future__ import annotations

import os
from typing import Callable, Optional

from .torch_convert import build_from_torch_checkpoint


def build_from_pretrained(
    task: str = "wsj0-mix",
    sample_rate: int = 8000,
    n_sources: int = 2,
    model_choice: str = "best",
    root: str = "./pretrained",
    fetcher: Optional[Callable[..., str]] = None,
):
    """Return (model, params) for a reference pretrained checkpoint.

    The reference's PRETRAINED.md lists the Google Drive IDs; download them
    where egress exists, then either pass the file path via `fetcher` or
    place them under `root` with the reference layout.
    """
    if fetcher is not None:
        path = fetcher(task=task, sample_rate=sample_rate, n_sources=n_sources,
                       model_choice=model_choice)
    else:
        path = os.path.join(
            root, task, f"sr{sample_rate}", f"{n_sources}speakers", f"{model_choice}.pth"
        )
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"pretrained checkpoint not found: {path}. Download it per the "
            "reference PRETRAINED.md and place it there (no egress here)."
        )
    return build_from_torch_checkpoint(path)
