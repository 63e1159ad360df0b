"""CLI surface tests (skani-style sketch/dist/search/triangle).

The reference enables skani's `cli` feature (Cargo.toml:34); the
subcommand surface mirrored here is SURVEY.md §2 S1 (Mode enum).
"""

import gzip

import numpy as np
import pytest

from pyskani_tpu import cli


@pytest.fixture(scope="module")
def genomes(tmp_path_factory):
    """Two related FASTA files (~60 kb, ~99% ANI) + one unrelated."""
    d = tmp_path_factory.mktemp("fasta")
    rng = np.random.default_rng(11)
    acgt = np.frombuffer(b"ACGT", np.uint8)
    base = rng.choice(acgt, size=60000)
    mut = base.copy()
    idx = rng.integers(0, len(mut), 600)
    mut[idx] = rng.choice(acgt, size=len(idx))
    other = rng.choice(acgt, size=60000)

    paths = {}
    for name, arr in [("a", base), ("b", mut), ("c", other)]:
        p = d / f"{name}.fa"
        seq = arr.tobytes().decode()
        p.write_text(f">{name} test genome\n{seq}\n")
        paths[name] = str(p)
    # one gzipped variant to exercise the gzip path
    pgz = d / "a.fa.gz"
    with gzip.open(pgz, "wt") as f:
        f.write(f">a test genome\n{base.tobytes().decode()}\n")
    paths["a_gz"] = str(pgz)
    return paths


def _parse_tsv(text):
    lines = text.strip().splitlines()
    assert lines[0].startswith("Ref_file\tQuery_file\tANI")
    return [line.split("\t") for line in lines[1:]]


def test_dist(genomes, capsys):
    rc = cli.main(["dist", "-q", genomes["b"], "-r", genomes["a"],
                   "--learned-ani", "no"])
    assert rc == 0
    rows = _parse_tsv(capsys.readouterr().out)
    assert len(rows) == 1
    ref, query, ani, af_r, af_q = rows[0]
    assert ref == "a.fa" and query == "b.fa"
    assert 95.0 < float(ani) <= 100.0
    assert 50.0 < float(af_q) <= 100.0


def test_dist_unrelated_no_hit(genomes, capsys):
    rc = cli.main(["dist", "-q", genomes["c"], "-r", genomes["a"],
                   "--learned-ani", "no"])
    assert rc == 0
    assert _parse_tsv(capsys.readouterr().out) == []


def test_sketch_then_search(genomes, tmp_path, capsys):
    dbdir = str(tmp_path / "db")
    assert cli.main(["sketch", "-o", dbdir, genomes["a"], genomes["c"]]) == 0
    capsys.readouterr()
    assert cli.main(["search", "-d", dbdir, genomes["b"],
                     "--learned-ani", "no"]) == 0
    rows = _parse_tsv(capsys.readouterr().out)
    assert [r[0] for r in rows] == ["a.fa"]


def test_triangle(genomes, capsys):
    rc = cli.main(["triangle", genomes["a"], genomes["b"], genomes["c"],
                   "--learned-ani", "no"])
    assert rc == 0
    rows = _parse_tsv(capsys.readouterr().out)
    pairs = {(r[0], r[1]) for r in rows}
    assert ("a.fa", "b.fa") in pairs or ("b.fa", "a.fa") in pairs
    # the unrelated genome should not pair with anything
    assert all("c.fa" not in p for p in pairs)


def test_gzip_fasta(genomes, capsys):
    rc = cli.main(["dist", "-q", genomes["b"], "-r", genomes["a_gz"],
                   "--learned-ani", "no"])
    assert rc == 0
    rows = _parse_tsv(capsys.readouterr().out)
    assert len(rows) == 1


def test_list_file_inputs(genomes, tmp_path, capsys):
    """-l/--ql/--rl file-of-filenames inputs (skani's list convention)."""
    lst = tmp_path / "refs.txt"
    lst.write_text(f"{genomes['a']}\n# comment\n{genomes['b']}\n")
    rc = cli.main(["dist", "-q", genomes["b"], "--rl", str(lst),
                   "--learned-ani", "no"])
    assert rc == 0
    rows = _parse_tsv(capsys.readouterr().out)
    assert {r[0] for r in rows} == {"a.fa", "b.fa"}

    rc = cli.main(["triangle", "-l", str(lst), "--learned-ani", "no"])
    assert rc == 0
    rows = _parse_tsv(capsys.readouterr().out)
    assert len(rows) == 1  # a-b pair


def test_empty_inputs_rejected(capsys):
    assert cli.main(["dist", "-q"]) == 2
    assert cli.main(["triangle"]) == 2


def test_search_mesh(genomes, tmp_path, capsys):
    """search --mesh DBxBATCH runs the query stream through the sharded
    engine and emits the same TSV surface."""
    out_db = str(tmp_path / "meshdb")
    cli.main(["sketch", "-o", out_db, genomes["a"], genomes["c"]])
    capsys.readouterr()
    rc = cli.main(["search", "-d", out_db, "--mesh", "4x2",
                   "--learned-ani", "no", genomes["b"]])
    assert rc == 0
    cap = capsys.readouterr().out.strip().splitlines()
    assert cap[0].startswith("Ref_file\tQuery_file\tANI")
    rows = [line.split("\t") for line in cap[1:]]
    assert any(r[0] == "a.fa" for r in rows)
    # parity with the unsharded search
    rc = cli.main(["search", "-d", out_db, "--learned-ani", "no",
                   genomes["b"]])
    assert rc == 0
    cap2 = capsys.readouterr().out.strip().splitlines()
    assert sorted(cap[1:]) == sorted(cap2[1:])


def test_search_mesh_bad_spec(genomes, tmp_path, capsys):
    out_db = str(tmp_path / "meshdb2")
    cli.main(["sketch", "-o", out_db, genomes["a"]])
    rc = cli.main(["search", "-d", out_db, "--mesh", "nope",
                   genomes["b"]])
    assert rc == 2


def test_triangle_mesh(genomes, capsys):
    """triangle --mesh DBxBATCH tiles the all-vs-all over the mesh and
    emits the same TSV as the single-device triangle."""
    rc = cli.main(["triangle", genomes["a"], genomes["b"], genomes["c"],
                   "--learned-ani", "no"])
    assert rc == 0
    single = sorted(capsys.readouterr().out.strip().splitlines()[1:])
    rc = cli.main(["triangle", genomes["a"], genomes["b"], genomes["c"],
                   "--learned-ani", "no", "--mesh", "4x2"])
    assert rc == 0
    sharded = sorted(capsys.readouterr().out.strip().splitlines()[1:])
    assert sharded == single
