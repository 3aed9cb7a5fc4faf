"""Pallas blocked Cholesky for TPU — placeholder dispatch for round-1 PR1.

The real blocked right-looking factorization kernel lands with the linalg
milestone (SURVEY.md §7 PR2).  Until then every call falls through to XLA,
which keeps the interface stable for the GP core.
"""

from __future__ import annotations

import jax

Array = jax.Array


def maybe_pallas_cholesky(K: Array):
    """Return the Pallas factorization if profitable on this backend, else None."""
    return None
