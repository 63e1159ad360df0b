# Typed public surface of pyskani_tpu — mirror of the reference stub
# /root/reference/src/pyskani/_skani.pyi:16-83 (same classes, methods,
# defaults and literal format names), plus this engine's documented
# extensions (sketch_many, est_ci / Hit.ci_low / Hit.ci_high).

import os
import pathlib
from typing import Any, Dict, Iterable, List, Literal, Optional, Sequence, Union

__version__: str
__author__: str
__build__: Dict[str, Any]
SKANI_VERSION: str
__all__: List[str]

_Path = Union[str, bytes, os.PathLike]
_Text = Union[str, bytes, bytearray, memoryview]
_Format = Literal["consolidated", "separated"]

class Sketch:
    @property
    def name(self) -> str: ...
    @property
    def c(self) -> int: ...
    @property
    def amino_acid(self) -> bool: ...
    def __repr__(self) -> str: ...

class Hit:
    def __init__(
        self,
        identity: float,
        query_name: str,
        query_fraction: float,
        reference_name: str,
        reference_fraction: float,
        *,
        ci_low: Optional[float] = None,
        ci_high: Optional[float] = None,
    ) -> None: ...
    @property
    def identity(self) -> float: ...
    @property
    def query_name(self) -> str: ...
    @property
    def query_fraction(self) -> float: ...
    @property
    def reference_name(self) -> str: ...
    @property
    def reference_fraction(self) -> float: ...
    @property
    def ci_low(self) -> Optional[float]: ...
    @property
    def ci_high(self) -> Optional[float]: ...
    def __repr__(self) -> str: ...

class Database:
    def __init__(
        self,
        path: Optional[_Path] = None,
        *,
        compression: int = 125,
        marker_compression: int = 1000,
        k: int = 15,
        format: Optional[_Format] = None,
    ) -> None: ...
    @classmethod
    def open(cls, path: _Path) -> "Database": ...
    @classmethod
    def load(cls, path: _Path) -> "Database": ...
    @property
    def path(self) -> Optional[pathlib.Path]: ...
    @property
    def compression(self) -> int: ...
    @property
    def marker_compression(self) -> int: ...
    def __enter__(self) -> "Database": ...
    def __exit__(self, exc_type: object, exc_value: object,
                 traceback: object) -> bool: ...
    def sketch(self, name: str, *contigs: _Text, seed: bool = True) -> None: ...
    def sketch_many(
        self, named_contigs: Iterable[tuple[str, Sequence[_Text]]]
    ) -> None: ...
    def query(
        self,
        name: str,
        *contigs: _Text,
        seed: bool = True,
        learned_ani: Optional[bool] = None,
        median: bool = False,
        robust: bool = False,
        cutoff: Optional[float] = None,
        faster_small: bool = False,
        est_ci: bool = False,
    ) -> List[Hit]: ...
    def save(
        self,
        path: _Path,
        overwrite: bool = False,
        format: Optional[_Format] = None,
    ) -> None: ...
    def flush(self) -> None: ...
