"""Round-9 operator invariants: q176 iterated BPE merges. The shared
DuckDB oracle run in test_queries covers the fixture corpus; these pin
the parts the fixture can't prove — the greedy left-to-right merge scan
on a same-token run (the a=b overlap case the window parity algebra
exists for), exact hand-checked merge rules, and cross-engine frame
equality on a corpus with real iterated structure."""

from __future__ import annotations

import duckdb
import pandas as pd

from smartbulkcopy_spark.queries import REGISTRY


def _write_documents(path, rows):
    pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "lang": ["en"] * len(rows),
            "source": ["src0"] * len(rows),
            "n_chars": [len(r[1] or "") for r in rows],
        }
    ).to_parquet(path / "documents.parquet", index=False)


def test_q176_greedy_run_parity(spark, tmp_path):
    """A run of 5 identical tokens with rule (z, z) must merge greedily
    left-to-right into [zz, zz, z] — pairs (1,2) and (3,4), never the
    overlapping (2,3) — and the minted rules of all three rounds follow
    by hand:
      r1: 'z z'  tf 4 (doc1's 4 adjacent pairs)        -> doc1 [zz,zz,z]
      r2: 'w w'  tf 1 (tie 'w w' < 'zz z' < 'zz zz')   -> doc2 [ww]
      r3: 'zz z' tf 1 (tie 'zz z' < 'zz zz')
    """
    d = tmp_path / "sf_q176a"
    d.mkdir()
    _write_documents(d, [(1, "z z z z z"), (2, "w w")])
    got = [
        tuple(r)
        for r in REGISTRY["q176_bpe_iterated_merges"]
        .fn(spark, str(d))
        .collect()
    ]
    assert got == [
        (1, "z z", 4, 1),
        (2, "w w", 1, 1),
        (3, "zz z", 1, 1),
    ]


MERGE_CORPUS = [
    (1, "the cat sat on the mat while the cat sat still"),
    (2, "the cat ran and the cat sat and the dog sat"),
    (3, "a a a a b b"),
    (4, "punctuation, stays; split. the cat, sat!"),
    (5, None),
    (6, "numbers 12 34 mix12mix 12 34"),
]


def test_q176_cross_engine_on_merge_corpus(spark, tmp_path):
    """Drive the registered Spark builder AND the registered oracle SQL
    over a corpus where the merged symbol from round 1 ('the cat' ->
    'thecat') participates in later rounds, same-token runs exercise the
    parity islands, and punctuation splits per the q38 pre-tokenizer —
    frames must be identical."""
    d = tmp_path / "sf_q176b"
    d.mkdir()
    _write_documents(d, MERGE_CORPUS)
    spec = REGISTRY["q176_bpe_iterated_merges"]
    got = spec.fn(spark, str(d)).toPandas()

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d / 'documents.parquet'}')"
    )
    want = con.execute(spec.oracle).arrow().to_pandas()
    con.close()

    assert list(got.columns) == list(want.columns)
    for col in got.columns:
        assert got[col].tolist() == want[col].tolist(), col
    # the corpus must actually iterate: a later round's rule must
    # involve a symbol minted earlier (merged symbols contain no space)
    pairs = got["pair"].tolist()
    assert pairs == ["the cat", "a a", "thecat sat"]
    merged = pairs[0].replace(" ", "")
    assert any(merged in p.split(" ") for p in pairs[1:])
