"""Database storage-format lifecycle tests.

Pin the same on-disk lifecycle semantics as the reference suite
(/root/reference/src/pyskani/tests/test_database.py): which artifacts
appear at sketch() time vs flush() time for each format.
"""

import os
import pathlib
import tempfile

import pytest

import pyskani_tpu


def test_memory():
    database = pyskani_tpu.Database()
    database.sketch("test genome", b"ATGC" * 100)
    assert database.path is None


def test_properties():
    db = pyskani_tpu.Database(compression=200, marker_compression=1000)
    assert db.compression == 200
    assert db.marker_compression == 1000


def test_folder_separated():
    with tempfile.TemporaryDirectory() as tmpdir:
        database = pyskani_tpu.Database(tmpdir, format="separated")
        database.sketch("test1", b"ATGC" * 100)
        database.sketch("test2", b"TTGC" * 100)
        assert os.path.exists(os.path.join(tmpdir, "test1.sketch"))
        assert os.path.exists(os.path.join(tmpdir, "test2.sketch"))
        assert not os.path.exists(os.path.join(tmpdir, "markers.bin"))
        database.flush()
        assert os.path.exists(os.path.join(tmpdir, "test1.sketch"))
        assert os.path.exists(os.path.join(tmpdir, "test2.sketch"))
        assert os.path.exists(os.path.join(tmpdir, "markers.bin"))
        assert database.path == pathlib.Path(tmpdir)


def test_folder_consolidated():
    with tempfile.TemporaryDirectory() as tmpdir:
        database = pyskani_tpu.Database(tmpdir, format="consolidated")
        database.sketch("test1", b"ATGC" * 100)
        database.sketch("test2", b"TTGC" * 100)
        assert os.path.exists(os.path.join(tmpdir, "sketches.db"))
        assert not os.path.exists(os.path.join(tmpdir, "index.db"))
        assert not os.path.exists(os.path.join(tmpdir, "markers.bin"))
        database.flush()
        assert os.path.exists(os.path.join(tmpdir, "sketches.db"))
        assert os.path.exists(os.path.join(tmpdir, "index.db"))
        assert os.path.exists(os.path.join(tmpdir, "markers.bin"))
        assert database.path == pathlib.Path(tmpdir)


def test_invalid_format():
    with tempfile.TemporaryDirectory() as tmpdir:
        with pytest.raises(ValueError):
            pyskani_tpu.Database(tmpdir, format="bogus")


def test_existing_markers_rejected():
    with tempfile.TemporaryDirectory() as tmpdir:
        with pyskani_tpu.Database(tmpdir) as db:
            db.sketch("a", b"ATGC" * 100)
        with pytest.raises(FileExistsError):
            pyskani_tpu.Database(tmpdir)


def test_duplicate_name_consolidated():
    with tempfile.TemporaryDirectory() as tmpdir:
        db = pyskani_tpu.Database(tmpdir, format="consolidated")
        db.sketch("dup", b"ATGC" * 100)
        with pytest.raises(ValueError):
            db.sketch("dup", b"ATGC" * 100)


def test_context_manager_flushes():
    with tempfile.TemporaryDirectory() as tmpdir:
        with pyskani_tpu.Database(tmpdir) as db:
            db.sketch("test1", b"ATGC" * 100)
        assert os.path.exists(os.path.join(tmpdir, "markers.bin"))
        assert os.path.exists(os.path.join(tmpdir, "index.db"))


def _roundtrip_db(tmpdir, fmt, loader):
    import numpy as np
    from conftest import mutate, random_genome
    rng = np.random.default_rng(42)
    g1 = random_genome(rng, 60_000)
    g2 = random_genome(rng, 50_000)
    with pyskani_tpu.Database(tmpdir, format=fmt) as db:
        db.sketch("g1", g1)
        db.sketch("g2", g2)
        q = mutate(rng, g1, sub_rate=0.02)
        hits_before = db.query("q", q)
    db2 = loader(tmpdir)
    assert db2.compression == 125
    hits_after = db2.query("q", q)
    assert len(hits_after) == len(hits_before) == 1
    assert hits_after[0].reference_name == "g1"
    assert hits_after[0].identity == pytest.approx(hits_before[0].identity,
                                                   abs=1e-6)


@pytest.mark.parametrize("fmt", ["consolidated", "separated"])
def test_open_roundtrip(fmt):
    with tempfile.TemporaryDirectory() as tmpdir:
        _roundtrip_db(tmpdir, fmt, pyskani_tpu.Database.open)


@pytest.mark.parametrize("fmt", ["consolidated", "separated"])
def test_load_roundtrip(fmt):
    with tempfile.TemporaryDirectory() as tmpdir:
        _roundtrip_db(tmpdir, fmt, pyskani_tpu.Database.load)


def test_missing_sketch_keyerror():
    db = pyskani_tpu.Database()
    db.sketch("x", b"ATGC" * 200)
    with pytest.raises(KeyError):
        db._storage.load("nope")


def test_hit_validation():
    with pytest.raises(ValueError):
        pyskani_tpu.Hit(1.5, "q", 0.5, "r", 0.5)
    with pytest.raises(ValueError):
        pyskani_tpu.Hit(0.5, "q", -0.1, "r", 0.5)
    h = pyskani_tpu.Hit(0.5, "q", 0.25, "r", 0.75)
    assert "identity=0.5" in repr(h)
    assert h.query_name == "q" and h.reference_name == "r"


def test_hit_insertion_order():
    """Hits come back in marker insertion order (reference lib.rs:616-657
    iterates markers in order, not alphabetically)."""
    import numpy as np
    from conftest import mutate, random_genome
    rng = np.random.default_rng(31)
    base = random_genome(rng, 60_000)
    db = pyskani_tpu.Database()
    for name in ("zeta", "alpha", "mike"):
        db.sketch(name, mutate(rng, base, 0.01))
    hits = db.query("q", base, learned_ani=False)
    assert [h.reference_name for h in hits] == ["zeta", "alpha", "mike"]


def test_array_input():
    """array.array contigs are accepted (reference _Sequence includes
    array, _skani.pyi:10; Text buffer handling utils.rs:74-102)."""
    import numpy as np
    from array import array
    from conftest import random_genome
    rng = np.random.default_rng(32)
    g = random_genome(rng, 60_000)
    db = pyskani_tpu.Database()
    db.sketch("ref", array("B", g))
    hits = db.query("q", memoryview(g), learned_ani=False)
    assert len(hits) == 1 and hits[0].identity > 0.999
