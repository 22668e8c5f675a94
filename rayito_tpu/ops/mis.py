"""Multiple-importance-sampling heuristics (Rayito_Stage7_QT/RSampling.h:382-397)."""

from __future__ import annotations

import jax.numpy as jnp


def balance_heuristic(n1, pdf1, n2, pdf2):
    w1 = n1 * pdf1
    w2 = n2 * pdf2
    return w1 / jnp.maximum(w1 + w2, 1e-37)


def power_heuristic(n1, pdf1, n2, pdf2):
    """beta=2 power heuristic — the path tracer's choice
    (RaytraceMain.cpp:399,432)."""
    w1 = n1 * pdf1
    w2 = n2 * pdf2
    return (w1 * w1) / jnp.maximum(w1 * w1 + w2 * w2, 1e-37)
