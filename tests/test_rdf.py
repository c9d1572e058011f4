"""RDF ingestion: N-Triples parser + KG conversion + prepare_dataset
end-to-end (SURVEY.md §2.1 data-acquisition row, §3.5 data path)."""

import gzip
import os
import sys

import numpy as np
import pytest

from mpqe_tpu.data import loader as loader_mod
from mpqe_tpu.data import rdf as rdf_mod
from mpqe_tpu.data.sampler import make_random_kg

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


NT = """\
# a comment line

<http://x/alice> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://x/Person> .
<http://x/bob> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://x/Person> .
<http://x/bob> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://x/Author> .
<http://x/p1> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://x/Paper> .
<http://x/alice> <http://x/knows> <http://x/bob> .
<http://x/bob> <http://x/wrote> <http://x/p1> .
<http://x/alice> <http://x/name> "Alice \\"A\\"@home"@en .
<http://x/p1> <http://x/year> "2020"^^<http://www.w3.org/2001/XMLSchema#int> .
_:b0 <http://x/knows> <http://x/alice> .
"""


def test_parse_ntriples_terms():
    rows = list(rdf_mod.parse_ntriples(NT.splitlines()))
    assert len(rows) == 9
    # literal with escaped quote + lang tag
    s, p, o, lit = rows[6]
    assert lit and o == 'Alice \\"A\\"@home'
    # typed literal
    assert rows[7][3] is True
    # blank node subject
    assert rows[8][0] == "_:b0" and rows[8][3] is False


@pytest.mark.parametrize("bad", [
    "<http://x/a> <http://x/p> <http://x/b>",       # missing dot
    '<http://x/a> "lit" <http://x/b> .',            # literal predicate
    "<http://x/a <http://x/p> <http://x/b> .",      # unterminated IRI
    '<http://x/a> <http://x/p> "open .',            # unterminated literal
    "<http://x/a> <http://x/p>",                    # truncated (no object)
    "<http://x/a>",                                 # truncated (subj only)
])
def test_parse_ntriples_rejects(bad):
    with pytest.raises(rdf_mod.NTriplesError):
        list(rdf_mod.parse_ntriples([bad]))


def test_kg_from_rdf_modes_relations_literals():
    kg = rdf_mod.kg_from_rdf(rdf_mod.parse_ntriples(NT.splitlines()))
    # entities: alice, bob, p1, _:b0 (untyped) — literals dropped
    assert kg.n_entities == 4
    # bob is multi-typed: lexicographically smallest IRI wins (Author)
    assert set(kg.mode_names) == {
        "http://x/Author", "http://x/Paper", "http://x/Person",
        rdf_mod.UNTYPED_MODE,
    }
    # knows appears Person->Author AND untyped->Person: two base rels;
    # wrote Author->Paper: one
    assert kg.n_base_rels == 3
    assert kg.n_triples == 3
    # determinism: same bytes, same arrays
    kg2 = rdf_mod.kg_from_rdf(rdf_mod.parse_ntriples(NT.splitlines()))
    np.testing.assert_array_equal(kg.entity_mode, kg2.entity_mode)
    np.testing.assert_array_equal(kg.heads, kg2.heads)
    assert kg.rel_names == kg2.rel_names


def test_kg_from_rdf_min_rel_count_prunes_entities():
    # wrote(1 triple) pruned at min_rel_count=2 -> paper entity vanishes
    lines = NT.splitlines() + [
        "<http://x/alice> <http://x/knows> <http://x/bob> .",  # dup: ignored
        "<http://x/carol> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://x/Person> .",
        "<http://x/carol> <http://x/knows> <http://x/bob> .",
    ]
    kg = rdf_mod.kg_from_rdf(rdf_mod.parse_ntriples(lines), min_rel_count=2)
    # only knows Person->Author survives (alice->bob, carol->bob)
    assert kg.n_base_rels == 1 and kg.n_triples == 2
    assert "http://x/Paper" not in kg.mode_names
    assert rdf_mod.UNTYPED_MODE not in kg.mode_names


def test_kg_from_rdf_pickle_round_trip(tmp_path):
    kg = rdf_mod.kg_from_rdf(rdf_mod.parse_ntriples(NT.splitlines()))
    p = str(tmp_path / "graph_data.pkl")
    loader_mod.save_graph_pickle(p, kg)
    kg2, _, _ = loader_mod.load_graph_pickle(p)
    assert kg2.n_entities == kg.n_entities
    assert kg2.n_base_rels == kg.n_base_rels
    assert kg2.n_triples == kg.n_triples
    assert sorted(kg2.entity_mode.tolist()) == sorted(kg.entity_mode.tolist())


def _write_nt_from_kg(kg, path, gz=False):
    """Emit a synthetic KG as N-Triples (entity IRIs carry ids; modes via
    rdf:type) so prepare_dataset can be driven without real RDF bytes."""
    lines = []
    for e in range(kg.n_entities):
        m = int(kg.entity_mode[e])
        lines.append(
            f"<http://s/e{e:04d}> <{rdf_mod.RDF_TYPE}> <http://s/M{m}> ."
        )
    for h, r, t in zip(kg.heads, kg.rels, kg.tails):
        lines.append(
            f"<http://s/e{int(h):04d}> <http://s/r{int(r)}> "
            f"<http://s/e{int(t):04d}> ."
        )
    data = "\n".join(lines) + "\n"
    if gz:
        with gzip.open(path, "wt") as f:
            f.write(data)
    else:
        with open(path, "w") as f:
            f.write(data)


def test_prepare_dataset_end_to_end(tmp_path):
    import prepare_dataset

    src = make_random_kg(
        n_entities=120, n_modes=3, n_base_rels=4, n_triples=900, seed=7)
    nt = str(tmp_path / "kg.nt.gz")
    _write_nt_from_kg(src, nt, gz=True)
    out = str(tmp_path / "data")
    prepare_dataset.main([
        "--nt", nt, "--out", out,
        "--train_per_structure", "40", "--eval_per_structure", "8",
        "--n_neg", "8", "--seed", "3",
    ])
    for name in ("graph_data.pkl", "kg.npz", "kg_full.npz", "dataset.json",
                 "train_edges.pkl", "val_edges.pkl", "test_edges.pkl",
                 "train_queries_2.pkl", "val_queries_3.pkl",
                 "test_queries_2.pkl"):
        assert os.path.exists(os.path.join(out, name)), name

    # the produced directory loads through the product CLI path
    import train as train_cli

    args = train_cli.parse_args(["--data", f"pkl:{out}"])
    kg, train_q, val_q = train_cli.load_data(args)
    assert kg.n_entities == src.n_entities
    assert "1-chain" in train_q and "1-chain" in val_q
    got_structs = set(train_q) | set(val_q)
    assert {"2-chain", "3-inter", "3-chain_inter"} <= got_structs

    # held-out 1-chain queries: the bound edge is ABSENT from the train
    # graph (generalization split) and true answers are not negatives
    train_kg = kg
    n_checked = 0
    for by_f in val_q["1-chain"].values():
        for q in by_f:
            nbrs = set(train_kg.neighbors(q.formula.rels[0], q.anchors[0])
                       .tolist())
            assert q.target not in nbrs
            assert q.target not in q.neg_samples
            n_checked += 1
    assert n_checked > 0

    # eval splits bucket correctly through the reference-style loader:
    # every held-out test edge lands in the one_new_edge bucket
    split = loader_mod.load_test_queries_pickle(
        os.path.join(out, "test_edges.pkl"), kg, train_kg=kg)

    def count(bucket):
        return sum(len(qs) for f in bucket.values() for qs in f.values())

    assert count(split["full_neg"]) == 0
    assert count(split["one_new_edge"]) > 0


def test_prepare_dataset_trains(tmp_path):
    """The prepared directory drives a real (tiny) training run."""
    import train as train_cli

    src = make_random_kg(
        n_entities=80, n_modes=2, n_base_rels=3, n_triples=500, seed=11)
    nt = str(tmp_path / "kg.nt")
    _write_nt_from_kg(src, nt)
    out = str(tmp_path / "data")
    import prepare_dataset

    prepare_dataset.main([
        "--nt", nt, "--out", out,
        "--train_per_structure", "30", "--eval_per_structure", "5",
        "--n_neg", "4", "--seed", "5",
    ])
    run = str(tmp_path / "run")
    train_cli.main([
        "--data", f"pkl:{out}", "--run_dir", run,
        "--embed_dim", "16", "--n_layers", "2", "--num_bases", "2",
        "--steps", "40", "--val_every", "20", "--batch_size", "32",
        "--n_neg", "2", "--seed", "1",
    ])
    assert os.path.exists(os.path.join(run, "metrics.jsonl"))

    # the TEST split (the set the reference reports) is reachable from
    # the same run dir — scores the prepared test_{edges,queries}.pkl
    import contextlib
    import io
    import json

    import evaluate as eval_cli

    for use in ("val", "test"):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            eval_cli.main(["--run_dir", run, "--n_neg", "4",
                           "--use", use])
        head = json.loads(buf.getvalue().splitlines()[0])
        assert head["use"] == use
        assert np.isfinite(head["auc_macro"])


def test_parse_ntriples_dot_without_whitespace():
    """N-Triples allows the terminating '.' to abut the object: blank
    node labels can't end with '.', and language tags never contain one."""
    rows = list(rdf_mod.parse_ntriples([
        "<http://a> <http://p> _:b0.",
        '<http://a> <http://p> "x"@en.',
        "<http://a> <http://p> <http://b>.",
        '<http://a> <http://p> "1"^^<http://t>.',
    ]))
    assert [r[2] for r in rows] == ["_:b0", "x", "http://b", "1"]
    assert [r[3] for r in rows] == [False, True, False, True]


def test_native_parse_matches_python():
    """The C++ nt_parse front end (cpp/mpqe_host.cpp) is array-identical
    to the Python parser + interner on the same bytes — ids, literal
    flags, AND the first-seen term table."""
    from mpqe_tpu.data import native as native_mod

    if not native_mod.ensure_built():
        pytest.skip("native library unavailable")
    tricky = NT + "\n".join([
        "<http://a> <http://p> _:b9.",
        '<http://a> <http://p> "x"@en.',
        "<http://a> <http://p> <http://b>.",
        '<http://a> <http://p> "1"^^<http://t>.',
        '  <http://ws> <http://p> <http://b> .  ',
        '<http://a> <http://p> "esc \\" quote" .',
    ]) + "\n"
    spo_p, lit_p, terms_p = rdf_mod.intern_statements(
        rdf_mod.parse_ntriples(tricky.splitlines()))
    spo_n, lit_n, terms_n = native_mod.parse_ntriples_native(
        tricky.encode())
    assert terms_n == terms_p
    np.testing.assert_array_equal(spo_n, spo_p)
    np.testing.assert_array_equal(lit_n, lit_p)


def test_native_parse_error_line():
    from mpqe_tpu.data import native as native_mod

    if not native_mod.ensure_built():
        pytest.skip("native library unavailable")
    bad = b"<http://a> <http://p> <http://b> .\n<http://a> nope .\n"
    with pytest.raises(rdf_mod.NTriplesError, match="line 2"):
        native_mod.parse_ntriples_native(bad)


def test_load_ntriples_kg_native_equals_python(tmp_path):
    from mpqe_tpu.data import native as native_mod

    if not native_mod.ensure_built():
        pytest.skip("native library unavailable")
    src = make_random_kg(
        n_entities=150, n_modes=3, n_base_rels=5, n_triples=1200, seed=13)
    nt = str(tmp_path / "kg.nt.gz")
    _write_nt_from_kg(src, nt, gz=True)
    kg_n = rdf_mod.load_ntriples_kg(nt, native=True)
    kg_p = rdf_mod.load_ntriples_kg(nt, native=False)
    np.testing.assert_array_equal(kg_n.entity_mode, kg_p.entity_mode)
    np.testing.assert_array_equal(kg_n.heads, kg_p.heads)
    np.testing.assert_array_equal(kg_n.rels, kg_p.rels)
    np.testing.assert_array_equal(kg_n.tails, kg_p.tails)
    assert kg_n.rel_names == kg_p.rel_names
    assert kg_n.mode_names == kg_p.mode_names


def test_parsers_fuzz_round_trip():
    """Randomized statements (IRIs, blank nodes, literals with escapes,
    lang tags, datatypes, creative whitespace, dot spacing) round-trip
    through BOTH parsers identically — the native parser does raw C
    string scanning, so fuzz what the grammar allows."""
    from mpqe_tpu.data import native as native_mod

    rng = np.random.default_rng(99)
    alphabet = list("abcXYZ09_-./#:~%")

    def iri():
        n = int(rng.integers(1, 12))
        return "http://" + "".join(rng.choice(alphabet, n))

    def bnode():
        return "_:b" + "".join(rng.choice(list("abc012"), 3))

    def literal():
        n = int(rng.integers(0, 8))
        # escaped quote (backslash-quote) and escaped backslash
        # (backslash-backslash) stay RAW in both parsers; tokens are
        # whole escape sequences so a quote is never left unescaped
        body = "".join(rng.choice(alphabet + ['\\"', "\\\\", " "], n))
        suffix = rng.choice(["", "@en", "@de-DE", "^^<http://t/int>"])
        return f'"{body}"{suffix}', True

    lines = []
    for _ in range(300):
        s = bnode() if rng.random() < 0.2 else f"<{iri()}>"
        p = f"<{iri()}>"
        if rng.random() < 0.4:
            o, _lit = literal()
        elif rng.random() < 0.5:
            o = f"<{iri()}>"
        else:
            o = bnode()
        ws1 = " " * int(rng.integers(1, 3))
        ws2 = "\t" if rng.random() < 0.2 else " "
        dot = rng.choice([" .", ".", "  .  "])
        # '.' directly after a datatype IRI / plain IRI / bnode / lang is
        # valid; after a bare literal with no suffix "x". is NOT handled
        # by the python scanner either (quote ends the term) — it is:
        lines.append(f"{s}{ws1}{p}{ws2}{o}{dot}")
    text = "\n".join(lines) + "\n"
    spo_p, lit_p, terms_p = rdf_mod.intern_statements(
        rdf_mod.parse_ntriples(text.splitlines()))
    assert len(lit_p) == 300
    if native_mod.ensure_built():
        spo_n, lit_n, terms_n = native_mod.parse_ntriples_native(
            text.encode())
        assert terms_n == terms_p
        np.testing.assert_array_equal(spo_n, spo_p)
        np.testing.assert_array_equal(lit_n, lit_p)


def test_parsers_agree_on_cr_terminators_and_invalid_utf8():
    """Bare-CR line terminators and invalid UTF-8 used to diverge: the
    native parser split lines only on '\\n' (silently dropping every
    statement after the first per physical CR-line) and interned raw
    BYTES while the Python twin interns decoded text (errors='replace'
    can merge byte-distinct terms).  Both front ends must now produce
    identical arrays on these inputs too."""
    from mpqe_tpu.data import native as native_mod

    if not native_mod.ensure_built():
        pytest.skip("native library unavailable")
    cases = [
        # bare CR: two statements, not one
        b"<http://a> <http://p> <http://b> .\r<http://c> <http://p> <http://d> .\r",
        # CRLF: one line break each, no phantom blank lines
        b"<http://a> <http://p> <http://b> .\r\n<http://c> <http://p> <http://d> .\r\n",
        # invalid UTF-8: \xff and \xfe both decode to U+FFFD -> the two
        # byte-distinct IRIs are ONE term after decoding
        b"<http://a\xff> <http://p> <http://a\xfe> .\n",
        # mixed terminators + a comment line
        b"# hdr\r<http://a> <http://p> <http://b> .\n<http://c> <http://p> <http://d> .\r\n",
    ]
    for data in cases:
        spo_n, lit_n, terms_n = native_mod.parse_ntriples_native(data)
        spo_p, lit_p, terms_p = rdf_mod.intern_statements(
            rdf_mod.parse_ntriples(
                data.decode("utf-8", "replace").splitlines()))
        assert terms_n == terms_p, data
        np.testing.assert_array_equal(spo_n, spo_p)
        np.testing.assert_array_equal(lit_n, lit_p)


def test_load_ntriples_kg_native_forced_builds_lazily(tmp_path):
    """native=True in a FRESH interpreter must trigger the lazy library
    build/load itself (it used to assume a prior available() call and
    crash on an assert)."""
    import subprocess
    import sys

    nt = tmp_path / "kg.nt"
    nt.write_text("<http://a> <http://p> <http://b> .\n"
                  "<http://b> <http://q> <http://a> .\n")
    code = (
        "from mpqe_tpu.data import rdf\n"
        f"kg = rdf.load_ntriples_kg({str(nt)!r}, native=True)\n"
        "print('entities', kg.n_entities)\n")
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        env={**__import__('os').environ, "JAX_PLATFORMS": "cpu"},
        timeout=300)
    assert out.returncode == 0, out.stderr
    assert "entities 2" in out.stdout
