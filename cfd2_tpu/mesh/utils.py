"""Small geometry helpers (reference: src/solver/mesh/utils.rs:4-29)."""

from __future__ import annotations

import numpy as np


def intersect_lines(p1, d1, p2, d2):
    """Intersection of lines p1 + t*t1 and p2 + s*t2 where t1/t2 are the
    tangents perpendicular to the given normals d1/d2.  Returns None for
    (near-)parallel lines.  Mirrors reference utils.rs:18-29, which intersects
    the two boundary tangent lines to reconstruct a sharp corner."""
    t1 = np.array([-d1[1], d1[0]])
    t2 = np.array([-d2[1], d2[0]])
    denom = t1[0] * t2[1] - t1[1] * t2[0]
    if abs(denom) < 1e-12:
        return None
    dx = p2[0] - p1[0]
    dy = p2[1] - p1[1]
    t = (dx * t2[1] - dy * t2[0]) / denom
    return (p1[0] + t1[0] * t, p1[1] + t1[1] * t)
