"""NumPy oracle implementation of the skani method (semantic spec)."""
from .seeding import Sketch, SketchParams, fmh_seeds, get_markers_only, mm_hash64, sketch_genome
from .chain import AniEstResult, ChainConfig, chain_seeds
