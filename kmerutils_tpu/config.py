"""Runtime configuration switches.

``use_pallas_tournament``: None (auto — Pallas kernel on a TPU backend, the
fused-XLA formulation elsewhere), True, or False.  Both paths are bit-exact
to each other (tests assert equality), so this is purely a performance
switch: the Pallas kernel avoids the u64-key emulation and slot-lane padding
and measures ~20% faster on v5e.
"""

from __future__ import annotations

use_pallas_tournament: bool | None = None


def pallas_tournament_enabled() -> bool:
    if use_pallas_tournament is not None:
        return use_pallas_tournament
    try:
        import jax
        return jax.default_backend() == "tpu"
    except Exception:
        return False
