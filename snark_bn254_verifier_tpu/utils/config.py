"""Framework configuration (mesh shape, batch sizes, compile cache).

The reference has no config system (behavior fully determined by input
bytes; SURVEY.md §5); for the TPU framework a small dataclass covers the
runtime knobs of the batched/sharded pipeline plus the JAX persistent
compilation cache (the unrolled-limb pairing graphs are expensive to
compile once, then free).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Optional, Tuple


@dataclass
class VerifierConfig:
    batch_size: int = 256          # proofs per device batch
    mesh_shape: Tuple[int, ...] = ()  # () = single device
    mesh_axis_names: Tuple[str, ...] = ("data",)
    msm_window_bits: int = 4
    cache_dir: str = os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache")


_cache_enabled = False


def enable_compilation_cache(cache_dir: Optional[str] = None) -> None:
    """Enable the persistent XLA compilation cache (idempotent)."""
    global _cache_enabled
    if _cache_enabled:
        return
    import jax

    path = cache_dir or os.environ.get(
        "TPU_BN254_CACHE", os.path.abspath(VerifierConfig().cache_dir)
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    _cache_enabled = True
