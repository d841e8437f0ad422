"""Property-based tests (hypothesis) for the invariants the oracle gate
can't sweep: MERGE algebra on arbitrary state/update sets and the
multi-format date parser on arbitrary dates.

Strategy sizes are kept small (Spark round-trips are ~100ms each) but the
value domains are adversarial: overlapping/disjoint keys, null updates,
pre-epoch and far-future dates, ordinal suffix edge cases (1st/2nd/3rd/
11th/12th/13th/21st...).
"""

from __future__ import annotations

import datetime

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from caseguarddatapipeline_spark.operators.incremental import merge_upsert

KEYS = st.integers(min_value=0, max_value=9)
VALS = st.one_of(st.none(), st.integers(min_value=-1000, max_value=1000))

state_sets = st.dictionaries(KEYS, st.integers(-1000, 1000), max_size=6)
update_sets = st.dictionaries(KEYS, VALS, max_size=6)

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, mapping):
    rows = [(k, v) for k, v in sorted(mapping.items())]
    return spark.createDataFrame(rows, "k long, v long") if rows else (
        spark.createDataFrame([], "k long, v long")
    )


@given(state=state_sets, updates=update_sets)
@settings(**_SETTINGS)
def test_merge_semantics_and_idempotency(spark, state, updates):
    s, u = _df(spark, state), _df(spark, updates)
    merged = merge_upsert(s, u, "k")
    got = {r["k"]: r["v"] for r in merged.collect()}

    # semantics: update value wins unless null (coalesce), state fills rest
    expect = dict(state)
    for k, v in updates.items():
        expect[k] = v if v is not None else state.get(k)
    assert got == expect

    # idempotency: applying the same update batch again changes nothing
    again = {r["k"]: r["v"] for r in merge_upsert(merged, u, "k").collect()}
    assert again == got


@given(
    dates=st.lists(
        st.dates(datetime.date(1901, 1, 1), datetime.date(2199, 12, 28)),
        min_size=1,
        max_size=8,
        unique=True,
    )
)
@settings(**_SETTINGS)
def test_multiformat_date_roundtrip(spark, dates):
    df = spark.createDataFrame([(d,) for d in dates], "d date")
    day = F.dayofmonth("d")
    suffix = (
        F.when(day.isin(11, 12, 13), "th")
        .when(day % 10 == 1, "st")
        .when(day % 10 == 2, "nd")
        .when(day % 10 == 3, "rd")
        .otherwise("th")
    )
    rendered = df.select(
        "d",
        F.date_format("d", "dd/MM/yyyy").alias("uk"),
        F.concat(
            day.cast("string"), suffix, F.lit(" "), F.date_format("d", "MMMM yyyy")
        ).alias("ordinal"),
    )

    def parse_any(c):
        stripped = F.regexp_replace(c, r"(\d+)(st|nd|rd|th)", r"$1")
        return F.coalesce(
            F.try_to_date(c, "dd/MM/yyyy"),
            F.try_to_date(c, "yyyy-MM-dd"),
            F.try_to_date(stripped, "d MMMM yyyy"),
        )

    out = rendered.select(
        "d", parse_any(F.col("uk")).alias("p_uk"), parse_any(F.col("ordinal")).alias("p_ord")
    ).collect()
    for r in out:
        assert r["p_uk"] == r["d"], f"uk parse {r}"
        assert r["p_ord"] == r["d"], f"ordinal parse {r}"


xy_lists = st.lists(
    st.tuples(st.integers(0, 255), st.integers(0, 255)),
    min_size=1,
    max_size=40,
    unique=True,
)


def _morton_ref(x: int, y: int, bits: int = 8) -> int:
    z = 0
    for b in range(bits):
        z |= ((x >> b) & 1) << (2 * b)
        z |= ((y >> b) & 1) << (2 * b + 1)
    return z


@given(pairs=xy_lists)
@settings(**_SETTINGS)
def test_zvalue_matches_reference_and_is_bijective(spark, pairs):
    """The JVM-expression Morton code equals the bit-level reference for
    arbitrary 8-bit inputs (so the oracle SQL twin is checking the right
    function), and the interleave is a bijection on the 16-bit domain
    (distinct (x,y) → distinct z — the property range-partitioning by z
    relies on for contiguous, non-overlapping file slices)."""
    from caseguarddatapipeline_spark.operators.layout import zvalue_col

    df = spark.createDataFrame(pairs, "x long, y long")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select("x", "y", zvalue_col(F.col("x"), F.col("y")).alias("z")).collect()
    }
    for (x, y), z in got.items():
        assert z == _morton_ref(x, y), (x, y)
    assert len(set(got.values())) == len(pairs)


# random corpora for the set-similarity joins: small docs over a small
# vocabulary so threshold-straddling pairs arise naturally; min_size=0
# deliberately includes sub-shingle-width (and empty) documents — the
# short-doc partial-shingle branch crashed under ANSI until round 5
_corpus = st.lists(
    st.lists(
        st.integers(min_value=0, max_value=25).map(lambda i: f"w{i}"),
        min_size=0,
        max_size=12,
    ),
    min_size=2,
    max_size=10,
)


def _corpus_df(spark, docs, tmpdir):
    import uuid

    path = f"{tmpdir}/{uuid.uuid4().hex}"
    spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(docs)],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(f"{path}/documents.parquet")
    return path


def _shingle_set(toks):
    """3-gram shingle set; 1-2-token docs keep their partial shingle and
    ZERO-token docs return None — they do not participate (both engines
    drop them: DuckDB's list_distinct removes the NULL slice, Spark
    filters on >= 1 token)."""
    if not toks:
        return None
    if len(toks) < 3:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}


@given(docs=_corpus)
@settings(**_SETTINGS)
def test_prefix_filter_join_property(spark, tmp_path_factory, docs):
    """Pigeonhole completeness on ARBITRARY corpora: the prefix-filter
    join's pair set equals brute-force 3-gram-shingle Jaccard >= 4/5."""
    import itertools

    from caseguarddatapipeline_spark.operators import dedup as D

    sets = {
        i: s for i, t in enumerate(docs) if (s := _shingle_set(t)) is not None
    }
    expected = set()
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        uni = len(sets[a] | sets[b])
        if 5 * inter >= 4 * uni:
            expected.add((a, b))

    path = _corpus_df(spark, docs, tmp_path_factory.mktemp("ppj"))
    got = {
        (r["doc_a"], r["doc_b"])
        for r in D.e1_prefix_filter_join(spark, path).collect()
    }
    assert got == expected


@given(docs=_corpus)
@settings(**_SETTINGS)
def test_containment_join_property(spark, tmp_path_factory, docs):
    """Containment completeness on ARBITRARY corpora: pair set equals
    brute-force 3-gram-shingle overlap coefficient >= 4/5 with the
    (size, doc_id) orientation."""
    import itertools

    from caseguarddatapipeline_spark.operators import dedup as D

    sh = {
        i: s for i, t in enumerate(docs) if (s := _shingle_set(t)) is not None
    }
    expected = set()
    for a, b in itertools.combinations(sorted(sh), 2):
        inter = len(sh[a] & sh[b])
        m = min(len(sh[a]), len(sh[b]))
        if 5 * inter >= 4 * m:
            s, l = (a, b) if (len(sh[a]), a) < (len(sh[b]), b) else (b, a)
            expected.add((s, l))

    path = _corpus_df(spark, docs, tmp_path_factory.mktemp("cont"))
    got = {
        (r["doc_small"], r["doc_large"])
        for r in D.e1_containment_join(spark, path).collect()
    }
    assert got == expected


@given(docs=_corpus)
@settings(**_SETTINGS)
def test_span_profile_property(spark, tmp_path_factory, docs):
    """Span-dedup profile on ARBITRARY corpora: per-doc distinct-span and
    cross-doc duplicated-span counts equal the brute-force sliding-window
    computation (docs shorter than SPAN_N yield no row)."""
    from caseguarddatapipeline_spark.operators import dedup as D

    n = D.SPAN_N
    spans = {
        i: {" ".join(t[j : j + n]) for j in range(len(t) - n + 1)}
        for i, t in enumerate(docs)
        if len(t) >= n
    }
    expected = {
        d: (
            len(s),
            len({x for x in s if any(x in spans[o] for o in spans if o != d)}),
        )
        for d, s in spans.items()
    }

    path = _corpus_df(spark, docs, tmp_path_factory.mktemp("span"))
    got = {
        r["doc_id"]: (r["n_spans"], r["n_dup_spans"])
        for r in D.e1_span_dedup(spark, path).collect()
    }
    assert got == expected
