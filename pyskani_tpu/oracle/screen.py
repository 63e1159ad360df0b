"""NumPy oracle for the marker-kmer screening prefilter.

Reconstructs ``skani::screen::check_markers_quickly`` (reference call site:
/root/reference/src/pyskani/_skani/lib.rs:623-628): estimate ANI from the
containment of shared marker k-mers and pass genomes above the screening
cutoff.  References with fewer than MIN_MARKERS_RESCUE markers pass
unconditionally unless ``faster_small`` disabled the rescue
(lib.rs:538-541 docstring). [RECON]
"""

from __future__ import annotations

import numpy as np

from ..params import MIN_MARKERS_RESCUE
from .seeding import Sketch


def marker_ani_estimate(query: Sketch, ref: Sketch) -> float:
    """ANI estimate from marker containment: (shared/|query|)^(1/marker_k)."""
    if len(query.markers) == 0 or len(ref.markers) == 0:
        return 0.0
    shared = len(np.intersect1d(query.markers, ref.markers,
                                assume_unique=True))
    ratio = shared / len(query.markers)
    return float(ratio ** (1.0 / query.marker_k))


def check_markers_quickly(query: Sketch, ref_markers: Sketch,
                          screen_val: float, rescue_small: bool) -> bool:
    if screen_val <= 0.0:
        return True
    if rescue_small and len(ref_markers.markers) < MIN_MARKERS_RESCUE:
        return True
    return marker_ani_estimate(query, ref_markers) > screen_val
