"""Property-based tests (hypothesis) over the pure driver-side functions:
the planner's partition-count clamps, the canonical bucket predicates,
SQL literal rendering, and table-set resolution invariants."""

from __future__ import annotations

import datetime as dt

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from smartbulkcopy_spark.config import EngineConfig, LogicalPartitioningStrategy
from smartbulkcopy_spark.model import TableInfo
from smartbulkcopy_spark.planner import (
    LogicalPartitionCopyTask,
    logical_partition_count,
    sql_literal,
)
from smartbulkcopy_spark.tableset import resolve_tables


@given(rows=st.integers(0, 10**12), gb=st.integers(0, 10**6),
       tasks=st.integers(1, 32))
def test_partition_count_is_odd_and_clamped(rows, gb, tasks):
    """The reference forces odd counts in [3, 3*tasks] for AUTO
    (client/TableAnalyzer.cs:246-270); the clamp+odd adjustment may
    exceed the ceiling by exactly one."""
    config = EngineConfig(max_parallel_tasks=tasks)
    n = logical_partition_count(config, rows, gb)
    assert n % 2 == 1
    assert 3 <= n <= 3 * tasks + 1


@given(n=st.integers(2, 64), keys=st.lists(
    st.one_of(st.integers(-10**12, 10**12), st.none()), min_size=1,
    max_size=200))
@settings(deadline=None, max_examples=50)
def test_bucket_predicates_partition_every_key(n, keys):
    """The canonical bucket expression assigns every key — including NULL
    and negative values — to exactly one of the n buckets (evaluated here
    with DuckDB as a neutral SQL engine)."""
    tasks = [
        LogicalPartitionCopyTask(
            source=TableInfo(name="t"), destination=TableInfo(name="t"),
            partition_number=i, n_partitions=n, bucket_column="k",
        )
        for i in range(1, n + 1)
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(k BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", [(k,) for k in keys])
    total = 0
    for task in tasks:
        total += con.execute(
            f"SELECT count(*) FROM t WHERE {task.predicate_sql()}"
        ).fetchone()[0]
    assert total == len(keys)
    con.close()


@given(v=st.one_of(
    st.integers(-10**15, 10**15),
    st.text(max_size=40).filter(lambda s: "\x00" not in s),
    st.dates(dt.date(1900, 1, 1), dt.date(2100, 1, 1)),
    st.datetimes(dt.datetime(1900, 1, 1), dt.datetime(2100, 1, 1)).map(
        lambda d: d.replace(microsecond=0)
    ),
    st.booleans(),
))
@settings(max_examples=200, deadline=None)
def test_sql_literal_round_trips_through_sql(v):
    """sql_literal must produce a literal a SQL engine parses back to the
    same value (the bug it replaced rendered Python repr). Temporal
    literals are quoted strings, so the round trip goes through the CAST
    a comparison predicate would apply."""
    lit = sql_literal(v)
    con = duckdb.connect()
    if isinstance(v, bool):
        got = con.execute(f"SELECT {lit}").fetchone()[0]
        assert got == (1 if v else 0)
    elif isinstance(v, dt.datetime):
        got = con.execute(f"SELECT CAST({lit} AS TIMESTAMP)").fetchone()[0]
        assert got == v
    elif isinstance(v, dt.date):
        got = con.execute(f"SELECT CAST({lit} AS DATE)").fetchone()[0]
        assert got == v
    else:
        got = con.execute(f"SELECT {lit}").fetchone()[0]
        assert str(got) == str(v)
    con.close()


def test_sql_literal_rejects_nul():
    import pytest

    with pytest.raises(ValueError):
        sql_literal("a\x00b")


@given(tables=st.lists(
    st.sampled_from(["a.t1", "a.t2", "b.t1", "b.t3"]), min_size=0,
    max_size=6, unique=True))
def test_tableset_include_star_selects_all(tables):
    out = resolve_tables(["*"], tables)
    assert len(out) == len(tables)
    assert len(set(out)) == len(out)  # deduplicated


@given(tables=st.lists(
    st.sampled_from(["a.t1", "a.t2", "b.t1", "b.t3"]), min_size=1,
    max_size=4, unique=True))
def test_tableset_exclude_inverts_include(tables):
    """Including * then excluding every table yields the empty set."""
    patterns = ["+:*"] + [f"-:{t}" for t in tables]
    assert resolve_tables(patterns, tables) == []


@given(
    target=st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)),
        min_size=1,
        max_size=60,
    ),
    part=st.integers(1, 128),
)
@settings(deadline=None, max_examples=100)
def test_staging_names_always_valid_identifiers(target, part):
    """Any target name — unicode, quotes, brackets, dots — folds to a
    plain unquoted identifier, deterministically."""
    import re

    from smartbulkcopy_spark.sources.jdbc import staging_plan

    p = staging_plan(target, "job", part)
    assert re.fullmatch(r"[A-Za-z0-9_]+", p.staging_table), p.staging_table
    assert p == staging_plan(target, "job", part)


@given(
    pair=st.lists(
        st.text(
            alphabet=st.characters(blacklist_categories=("Cs",)),
            min_size=1,
            max_size=30,
        ),
        min_size=2,
        max_size=2,
        unique=True,
    )
)
@settings(deadline=None, max_examples=100)
def test_staging_names_distinct_for_distinct_targets(pair):
    """Distinct raw targets never share a staging table (the hash tag
    disambiguates names that fold identically, e.g. 'a b' vs 'a.b')."""
    from smartbulkcopy_spark.sources.jdbc import staging_plan

    a, b = pair
    assert (
        staging_plan(a, "j", 1).staging_table
        != staging_plan(b, "j", 1).staging_table
    )


@given(
    names=st.lists(
        st.text(
            alphabet=st.characters(
                blacklist_categories=("Cs",), blacklist_characters="\x00"
            ),
            min_size=1,
            max_size=20,
        ),
        min_size=1,
        max_size=8,
        unique=True,
    ),
    type_ids=st.lists(st.sampled_from([127, 56, 231, 167, 106, 42, 41, 43, 165, 36]),
                      min_size=8, max_size=8),
)
@settings(deadline=None, max_examples=60)
def test_custom_schema_hints_parse_as_spark_ddl(spark, names, type_ids):
    """The generated customSchema string must be accepted by Spark's own
    DDL parser for ANY legal column name (backticks, spaces, unicode)."""
    from pyspark.sql.types import StructType

    from smartbulkcopy_spark.types import custom_schema_hints

    cols = [(n, t, 18, 2) for n, t in zip(names, type_ids)]
    hints = custom_schema_hints(cols)
    parsed = StructType.fromDDL(hints)
    assert [f.name for f in parsed.fields] == [c[0] for c in cols]


@given(
    d2s=st.lists(
        st.integers(0, 3 * 10**14), min_size=1, max_size=8, unique=False
    )
)
@settings(deadline=None)  # first call pays the pyspark import
def test_packed_argmin_equals_lexicographic(d2s):
    """The q77 packed argmin — min(d2 * K + cid) % K — must equal the
    lexicographic (d2, cid) minimum for any distance profile, including
    exact ties (where the smaller cid must win)."""
    from smartbulkcopy_spark.pipeline.similarity import KMEANS_K

    pairs = list(enumerate(d2s))  # cid -> d2, cids < K by construction
    expected = min(pairs, key=lambda p: (p[1], p[0]))[0]
    packed = min(d2 * KMEANS_K + cid for cid, d2 in pairs) % KMEANS_K
    assert packed == expected


@given(n=st.integers(0, 10_000))
@settings(deadline=None, max_examples=80)
def test_p2_case_picks_smallest_covering_power(n):
    """The generated power-of-two bucket CASE (q90) must assign every
    token count its smallest covering power of two — evaluated through
    DuckDB so the SQL itself is what is being checked."""
    from smartbulkcopy_spark.pipeline.text import _P2_BUCKETS, _p2_case

    (got,) = duckdb.sql(f"SELECT {_p2_case(str(n))}").fetchone()
    if n <= 0:
        assert got == 0
    else:
        covering = [b for b in _P2_BUCKETS if n <= b]
        assert got == (covering[0] if covering else 2 * _P2_BUCKETS[-1])


@given(doc_id=st.integers(0, 2**62), mod=st.sampled_from([32, 100]))
@settings(deadline=None, max_examples=60)
def test_hash_bucket_sql_matches_reference_md5(doc_id, mod):
    """The duck spelling of the shared hash bucket (q50/q76/q86/q92/q98
    family) must equal a direct Python md5 computation."""
    import hashlib

    from smartbulkcopy_spark.pipeline.text import hash_bucket_sql

    (got,) = duckdb.sql(
        "SELECT " + hash_bucket_sql("duck", str(doc_id), mod)
    ).fetchone()
    expect = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:4], 16) % mod
    assert got == expect


@given(n=st.integers(1, 5_000))
@settings(deadline=None, max_examples=100)
def test_curriculum_stage_formula_partitions_evenly(n):
    """q89's REAL stage expression (the shared stage_expr_sql spelling,
    evaluated through DuckDB over every rank) must cut any corpus into
    exactly min(4, N) stages whose sizes differ by at most one and sum
    to N, monotone in rank."""
    from collections import Counter

    from smartbulkcopy_spark.pipeline.text import stage_expr_sql

    stages = [
        s
        for (s,) in duckdb.sql(
            f"SELECT {stage_expr_sql('duck', str(n))} FROM"
            f" (SELECT unnest(range(1, {n} + 1)) AS rn) ORDER BY rn"
        ).fetchall()
    ]
    sizes = Counter(stages)
    assert sum(sizes.values()) == n
    assert stages == sorted(stages)  # monotone in rank
    assert len(sizes) == min(4, n)
    assert set(sizes) <= {1, 2, 3, 4}
    if n >= 4:  # below 4 docs the sparse stage ids are expected
        assert set(sizes) == {1, 2, 3, 4}
    assert max(sizes.values()) - min(sizes.values()) <= 1


@given(
    texts=st.lists(
        st.text(alphabet=" ab\t\nc", max_size=24), min_size=1, max_size=8
    )
)
@settings(deadline=None, max_examples=40)
def test_bigram_lm_oracle_matches_pure_python(texts):
    """The drafted round-12 bigram-LM oracle must agree with an
    independent pure-Python add-one model on arbitrary whitespace-messy
    corpora — including all-blank docs, single-token docs, and tie-dense
    tiny vocabularies (the Spark builder is pinned to the same oracle on
    the fixture in test_round11_ops)."""
    import re
    from collections import Counter

    import pandas as pd

    from smartbulkcopy_spark.pipeline.text import _bigram_lm_oracle

    norm = [re.sub(r"\s+", " ", t).lower().strip() for t in texts]
    toks = [n.split(" ") if n else [] for n in norm]
    v = len({w for ts in toks for w in ts})
    c12, c1 = Counter(), Counter()
    for ts in toks:
        for a, b in zip(ts, ts[1:]):
            c12[(a, b)] += 1
            c1[a] += 1
    want = []
    for i, ts in enumerate(toks):
        ps = [
            (c12[(a, b)] + 1) * 1_000_000 // (c1[a] + v)
            for a, b in zip(ts, ts[1:])
        ]
        if ps:
            want.append((i, len(ps), sum(ps) // len(ps), min(ps)))
        else:
            want.append((i, 0, 0, 0))

    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    con = duckdb.connect()
    con.register("documents", df)
    got = [tuple(r) for r in con.execute(_bigram_lm_oracle()).fetchall()]
    con.close()
    assert got == want
