"""Hit: one query result.

API-parity port of the reference ``Hit`` pyclass
(/root/reference/src/pyskani/_skani/hit.rs:18-123): same constructor
validation (values in [0, 1] else ValueError), same attribute surface,
same repr format.  Values are stored as float32 like the reference's
``AniEstResult`` (f32 fields, hit.rs:50-55).
"""

from __future__ import annotations

import numpy as np


class Hit:
    __slots__ = ("_identity", "_query_name", "_query_fraction",
                 "_reference_name", "_reference_fraction")

    def __init__(self, identity: float, query_name: str,
                 query_fraction: float, reference_name: str,
                 reference_fraction: float):
        identity = float(np.float32(identity))
        query_fraction = float(np.float32(query_fraction))
        reference_fraction = float(np.float32(reference_fraction))
        if not 0.0 <= identity <= 1.0:
            raise ValueError(f"Invalid value for `identity`: {identity}")
        if not 0.0 <= query_fraction <= 1.0:
            raise ValueError(
                f"Invalid value for `query_fraction`: {query_fraction}")
        if not 0.0 <= reference_fraction <= 1.0:
            raise ValueError(
                f"Invalid value for `reference_fraction`: {reference_fraction}")
        self._identity = identity
        self._query_name = query_name
        self._query_fraction = query_fraction
        self._reference_name = reference_name
        self._reference_fraction = reference_fraction

    @property
    def identity(self) -> float:
        return self._identity

    @property
    def query_name(self) -> str:
        return self._query_name

    @property
    def query_fraction(self) -> float:
        return self._query_fraction

    @property
    def reference_name(self) -> str:
        return self._reference_name

    @property
    def reference_fraction(self) -> float:
        return self._reference_fraction

    def __repr__(self) -> str:
        return ("Hit(identity={!r}, query_name={!r}, query_fraction={!r}, "
                "reference_name={!r}, reference_fraction={!r})").format(
            self._identity, self._query_name, self._query_fraction,
            self._reference_name, self._reference_fraction)
