"""SPARK_GRAFT_PROFILE=1 stage-timing marks, shared by pipeline.validate
and operators.clustered.check_rowlevel_clustered (one definition of the
env flag + output format instead of a hand-rolled closure per call
site)."""

from __future__ import annotations

import os
import time
from typing import Callable


def profile_marker(tag: str) -> Callable[[str], None]:
    """A ``mark(label)`` printing ``[tag] label: <delta>s`` since the
    previous mark when SPARK_GRAFT_PROFILE=1, else a no-op."""
    if os.environ.get("SPARK_GRAFT_PROFILE") != "1":
        return lambda label: None
    last = [time.monotonic()]

    def mark(label: str) -> None:
        now = time.monotonic()
        print(f"[{tag}] {label}: {now - last[0]:.2f}s", flush=True)
        last[0] = now

    return mark
