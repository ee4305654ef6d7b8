"""Property-based invariants (hypothesis) over randomized pivot frames —
the Spark analog of the reference's randomized unittest strategy
(``tests/transforms/test_totals.py:18`` randint frames) extended to real
property testing:

- totals row == column sums; grand corner == total of totals
- totals ∘ subtotals commutes (reference ``test_totals.py:153-164``)
- percentages sum to base across the divided axis
- apportioned rounding preserves the base exactly
- drop_totals is a left inverse of add_totals

One shared SparkSession; hypothesis drives small shapes (Spark job per
example is the cost — examples are capped, shapes are presentation-sized,
which is the operators' actual domain).
"""
import math

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from flatbread_spark import FlatFrame

SET = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

frames = st.integers(2, 4).flatmap(
    lambda ncols: st.integers(2, 5).flatmap(
        lambda nrows: st.lists(
            st.lists(st.integers(0, 100), min_size=ncols, max_size=ncols),
            min_size=nrows, max_size=nrows,
        )
    )
)


def lift(spark, data, two_level=False):
    nrows = len(data)
    if two_level:
        idx = pd.MultiIndex.from_tuples(
            [(f"g{i // 2}", f"r{i}") for i in range(nrows)], names=["g", "r"]
        )
    else:
        idx = pd.Index([f"r{i}" for i in range(nrows)], name="r")
    pdf = pd.DataFrame(data, index=idx,
                       columns=[f"c{j}" for j in range(len(data[0]))])
    return pdf, FlatFrame.from_pandas(spark, pdf)


@given(data=frames)
@settings(**SET)
def test_totals_row_is_column_sum(spark, data):
    pdf, ff = lift(spark, data)
    out = ff.add_totals(axis=0).to_pandas()
    for c in pdf.columns:
        assert out.loc["Totals", c] == pdf[c].sum()


@given(data=frames)
@settings(**SET)
def test_totals_axis2_corner_consistent(spark, data):
    pdf, ff = lift(spark, data)
    out = ff.add_totals(axis=2).to_pandas()
    assert out.loc["Totals", "Totals"] == pdf.values.sum()
    for c in pdf.columns:
        assert out.loc["Totals", c] == pdf[c].sum()
    for r in pdf.index:
        assert out.loc[r, "Totals"] == pdf.loc[r].sum()


@given(data=frames)
@settings(**SET)
def test_totals_subtotals_commute(spark, data):
    _, ff = lift(spark, data, two_level=True)
    a = ff.add_totals(axis=0).add_subtotals(axis=0, level=0).to_pandas()
    b = ff.add_subtotals(axis=0, level=0).add_totals(axis=0).to_pandas()
    a_sorted = a.sort_index()
    b_sorted = b.sort_index()
    assert a_sorted.equals(b_sorted), (a_sorted, b_sorted)


@given(data=frames)
@settings(**SET)
def test_percentages_sum_to_base(spark, data):
    pdf, ff = lift(spark, data)
    if (pdf.sum(axis=1) == 0).any():
        return  # zero-row → division by zero → undefined pcts
    out = ff.add_totals(axis=1).as_percentages(axis=1, base=100).to_pandas()
    for r in pdf.index:
        row = out.loc[r, [c for c in pdf.columns]]
        assert math.isclose(row.sum(), 100.0, rel_tol=1e-9)


@given(data=frames)
@settings(**SET)
def test_apportioned_rounding_preserves_base(spark, data):
    """Apportioning runs down each column (reference parity: DataFrame piped
    through Series cumsum, ``percentages.py:229-233,413-419``), so the exact
    invariant is on axis=0 percentages: every column's data cells sum to the
    base after rounding."""
    pdf, ff = lift(spark, data)
    if (pdf.sum(axis=0) == 0).any():
        return
    out = (
        ff.add_totals(axis=0)
        .as_percentages(axis=0, base=100, ndigits=0, apportioned_rounding=True)
        .to_pandas()
    )
    for c in pdf.columns:
        col = out.loc[[r for r in pdf.index], c]
        assert math.isclose(col.sum(), 100.0, abs_tol=1e-9), (c, col.tolist())


@given(data=frames)
@settings(**SET)
def test_drop_totals_roundtrip(spark, data):
    pdf, ff = lift(spark, data)
    back = ff.add_totals(axis=0).drop_totals().to_pandas()
    assert back.shape[0] == pdf.shape[0]
    for c in pdf.columns:
        assert back[c].tolist() == pdf[c].tolist()


asof_events = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c"]),          # key
        st.integers(0, 50),                        # ts
    ),
    min_size=1, max_size=12,
)


@given(left=asof_events, right=asof_events,
       direction=st.sampled_from(["backward", "forward"]))
@settings(**SET)
def test_asof_join_matches_pandas_merge_asof(spark, left, right, direction):
    """asof_join ≡ pandas merge_asof on random keyed event sets (right
    timestamps deduped per key — merge_asof picks the LAST of equal-ts right
    rows, an order-dependent choice our set-semantics operator rejects by
    construction)."""
    from flatbread_spark.operators.asof import asof_join

    seen = set()
    rdedup = []
    for k, ts in right:
        if (k, ts) not in seen:
            seen.add((k, ts))
            rdedup.append((k, ts))
    ldf = pd.DataFrame(left, columns=["k", "ts"]).sort_values("ts", kind="stable")
    rdf = pd.DataFrame(rdedup, columns=["k", "rts"]).sort_values("rts", kind="stable")
    rdf["rv"] = rdf["k"] + rdf["rts"].astype(str)

    expected = pd.merge_asof(
        ldf, rdf.rename(columns={"rts": "ts"}), on="ts", by="k",
        direction=direction,
    )
    got = asof_join(
        spark.createDataFrame(ldf), spark.createDataFrame(rdf),
        on=["k"], left_ts="ts", right_ts="rts", direction=direction,
    ).collect()

    exp = sorted(
        (r.k, r.ts, None if pd.isna(r.rv) else r.rv) for r in expected.itertuples()
    )
    act = sorted((r.k, r.ts, r.rv) for r in got)
    assert act == exp


range_events = st.lists(
    st.tuples(st.sampled_from(["a", "b"]), st.integers(-60, 60)),
    min_size=1, max_size=10,
)


@given(left=range_events, right=range_events,
       bounds=st.tuples(st.integers(-20, 19), st.integers(-19, 20)).filter(
           lambda b: b[1] > b[0]),
       base=st.sampled_from(
           [0, 1_700_000_000_000_000_001, -1_700_000_000_000_000_001]
       ))
@settings(**SET)
def test_range_join_matches_naive_inequality_join(spark, left, right, bounds, base):
    from flatbread_spark.operators.asof import range_join_bucketed

    # `base` shifts timestamps to odd int64-nanosecond magnitudes beyond
    # 2^53 — exactly where double-division bucket ids silently misrounded
    # before the exact pmod+decimal floor division (ADVICE r2); the naive
    # Python oracle below compares with exact ints either way
    lower, upper = bounds
    left = [(k, ts + base) for k, ts in left]
    right = [(k, ts + base) for k, ts in right]
    ldf = spark.createDataFrame(
        [(k, i, ts) for i, (k, ts) in enumerate(left)], ["k", "lid", "ts"]
    )
    rdf = spark.createDataFrame(
        [(k, i, ts) for i, (k, ts) in enumerate(right)], ["k", "rid", "rts"]
    )
    got = sorted(
        (r.lid, r.rid)
        for r in range_join_bucketed(
            ldf, rdf, on=["k"], left_ts="ts", right_ts="rts",
            lower=lower, upper=upper,
        ).collect()
    )
    naive = sorted(
        (li, ri)
        for (lk, lts), li in zip(left, range(len(left)))
        for (rk, rts), ri in zip(right, range(len(right)))
        if lk == rk and lts + lower <= rts <= lts + upper
    )
    assert got == naive


_phrases = [
    "the quick brown fox jumps over the lazy dog",
    "pack my box with five dozen liquor jugs",
    "the quick brown fox jumps over the lazy cat",
    "sphinx of black quartz judge my vow",
]


@given(picks=st.lists(st.integers(0, 3), min_size=3, max_size=10))
@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_minhash_cap_is_conservative(spark, picks):
    """Capped minhash pairs ⊆ uncapped pairs on arbitrary duplicate-heavy
    corpora (the star edges of an over-cap bucket are candidates of the
    uncapped self-join too, and verification is identical), and every capped
    pair keeps the exact uncapped jaccard."""
    from flatbread_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.createDataFrame(
        [(i, _phrases[p]) for i, p in enumerate(picks)], ["doc_id", "text"]
    )
    kw = dict(n=2, num_hashes=16, bands=4, threshold=0.3)
    full = {(r.id_a, r.id_b): r.jaccard
            for r in minhash_lsh_pairs(docs, "doc_id", "text",
                                       max_band_bucket=None, **kw).collect()}
    capped = {(r.id_a, r.id_b): r.jaccard
              for r in minhash_lsh_pairs(docs, "doc_id", "text",
                                         max_band_bucket=2, **kw).collect()}
    assert set(capped) <= set(full)
    assert all(full[p] == j for p, j in capped.items())


@given(rows=st.lists(
    st.tuples(st.sampled_from(["x", "y", "z"]), st.integers(-1000, 1000)),
    min_size=1, max_size=30),
    n_salts=st.sampled_from([1, 3, 16]))
@settings(**SET)
def test_salted_agg_equals_plain_groupby(spark, rows, n_salts):
    """Two-stage salted aggregation is semantically identical to the plain
    groupBy for any (count, sum) workload, any salt width — integer sums are
    associative so the salt-induced partial split cannot change results."""
    import pyspark.sql.functions as F

    from flatbread_spark.operators.skew import salted_agg

    df = spark.createDataFrame(rows, ["k", "v"])
    got = {
        r.k: (r.n, r.tot)
        for r in salted_agg(
            df, ["k"],
            {"n": (F.count(F.lit(1)), F.sum("n")),
             "tot": (F.sum("v"), F.sum("tot"))},
            n_salts=n_salts,
        ).collect()
    }
    exp = {}
    for k, v in rows:
        n, t = exp.get(k, (0, 0))
        exp[k] = (n + 1, t + v)
    assert got == exp


# ----------------------------------------------------------- sequence packing
token_lists = st.lists(st.integers(0, 40), min_size=1, max_size=30)


@given(toks=token_lists, ctx=st.integers(2, 16))
@settings(**SET)
def test_pack_sequences_geometry_property(spark, toks, ctx):
    """For ANY token-count distribution (zeros included) and ANY ctx size:
    the stream is gapless, geometry fields agree with the cumsum, and
    n_splits is never negative."""
    from flatbread_spark.operators.packing import pack_sequences

    df = spark.createDataFrame(
        [(i, int(t)) for i, t in enumerate(toks)], "doc_id long, tok long"
    )
    from pyspark.sql import functions as F

    # sort by stream START: zero-token docs share cum_tokens with their
    # predecessor, so cum is not a total stream order but start is gapless
    rows = sorted(
        pack_sequences(df, key_col="doc_id", tokens_col=F.col("tok"),
                       ctx_len=ctx, salt=":h").collect(),
        key=lambda r: (r.cum_tokens - r.n_tokens, r.cum_tokens, r.doc_id),
    )
    prev = 0
    for r in rows:
        start = r.cum_tokens - r.n_tokens
        assert start == prev
        assert r.pack_id == start // ctx
        assert r.pack_offset == start % ctx
        assert r.n_splits >= 0
        if r.n_tokens > 0:
            assert r.n_splits == (r.cum_tokens - 1) // ctx - start // ctx
        prev = r.cum_tokens
    assert prev == sum(toks)


@given(
    vals=st.lists(
        st.decimals(
            min_value="-99.999999999999",
            max_value="99.999999999999",
            places=12,
            allow_nan=False,
            allow_infinity=False,
        ),
        min_size=1,
        max_size=40,
    ),
    nparts=st.integers(2, 6),
)
@settings(**SET)
def test_two_phase_decimal_cumsum_matches_window(spark, vals, nparts):
    """Unit-level equivalence for the apportioning scale path: the
    range-partitioned two-phase decimal running sum equals the
    unpartitioned window sum digit-for-digit, for random (incl. negative)
    decimal(28,12) values under any partition count."""
    from decimal import Decimal

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from flatbread_spark.operators.ranking import two_phase_decimal_cumsums

    rows = [(float(i + 1), str(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "__pos__ double, raw string").withColumn(
        "v", F.col("raw").cast("decimal(28,12)")
    )
    ranged = {
        r["__pos__"]: r["v__cum__"]
        for r in two_phase_decimal_cumsums(
            df, ["__pos__"], ["v"], num_partitions=nparts
        ).collect()
    }
    w = Window.orderBy("__pos__").rowsBetween(Window.unboundedPreceding, 0)
    window = {
        r["__pos__"]: r["c"]
        for r in df.withColumn(
            "c", F.sum("v").over(w).cast("decimal(28,12)")
        ).collect()
    }
    assert set(ranged) == set(window)
    for k in window:
        assert Decimal(ranged[k]) == Decimal(window[k]), (k, ranged[k], window[k])


@given(
    vals=st.lists(st.integers(-1000, 1000), min_size=1, max_size=60),
    k=st.integers(1, 12),
    nparts=st.integers(2, 5),
)
@settings(**SET)
def test_quantile_bucketize_properties(spark, vals, k, nparts):
    """Equi-depth invariants for random values (ties included) under any
    partition count: every bucket size within ±1 of every other, buckets
    cover exactly 1..min(k, n), and bucket boundaries respect the
    (value, key) total order."""
    from pyspark.sql import functions as F

    from flatbread_spark.operators.ranking import quantile_bucketize

    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id bigint, v bigint")
    out = quantile_bucketize(df, "v", "id", k, num_partitions=nparts).collect()
    n = len(rows)
    sizes = {}
    for r in out:
        sizes[r["bucket"]] = sizes.get(r["bucket"], 0) + 1
    if k <= n:
        # k full buckets, sizes within +-1 of each other
        assert set(sizes) == set(range(1, k + 1))
        assert max(sizes.values()) - min(sizes.values()) <= 1
    else:
        # more buckets than rows: every row gets its own bucket, spread
        # (not packed) across 1..k by the same formula
        assert len(sizes) == n and set(sizes.values()) == {1}
        assert min(sizes) == 1 and max(sizes) <= k
    order = {r[0]: pos for pos, r in enumerate(sorted(rows, key=lambda t: (t[1], t[0])))}
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r["bucket"], []).append(order[r["id"]])
    present = sorted(by_bucket)
    for lo, hi in zip(present, present[1:]):
        assert max(by_bucket[lo]) < min(by_bucket[hi])


@given(
    vals=st.lists(st.integers(-1000, 1000), min_size=1, max_size=60),
    qs=st.lists(st.integers(1, 1_000_000), min_size=1, max_size=6, unique=True),
)
@settings(**SET)
def test_exact_percentiles_matches_sorted_list(spark, vals, qs):
    """Nearest-rank percentile == the ceil(q·n/1e6)-th element of the
    sorted list, for arbitrary ppm points and tied values."""
    from flatbread_spark.operators.ranking import exact_percentiles

    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id bigint, v bigint")
    got = {
        r["q_ppm"]: (r["pos"], r["v"])
        for r in exact_percentiles(df, "v", "id", qs).collect()
    }
    ordered = sorted(vals)
    n = len(ordered)
    for q in qs:
        pos = max(1, (q * n + 999_999) // 1_000_000)
        assert got[q] == (pos, ordered[pos - 1]), q


@given(
    groups=st.dictionaries(
        st.sampled_from(["a", "b", "c"]),
        st.integers(1, 40),
        min_size=1,
        max_size=3,
    ),
    targets=st.dictionaries(
        st.sampled_from(["a", "b", "c"]),
        st.integers(1, 500_000),
        min_size=1,
        max_size=3,
    ),
)
@settings(**SET)
def test_sample_to_mix_share_invariants(spark, groups, targets):
    """For any pool and any valid recipe over present groups: each kept
    group count equals t_g·M div 1e6 for the binding M, no kept count
    exceeds the pool, and kept shares never exceed targets by more than
    the integer-floor slack (1 row per group)."""
    from flatbread_spark.operators.sampling import sample_to_mix

    targets = {g: t for g, t in targets.items() if g in groups}
    if not targets or sum(targets.values()) > 1_000_000:
        return
    rows = []
    i = 0
    for g, cnt in groups.items():
        for _ in range(cnt):
            rows.append((i, g))
            i += 1
    df = spark.createDataFrame(rows, "id bigint, g string")
    out = sample_to_mix(df, "id", "g", targets).collect()
    from collections import Counter

    kept = Counter(r["g"] for r in out)
    m = min(groups[g] * 1_000_000 // t for g, t in targets.items())
    for g, t in targets.items():
        assert kept.get(g, 0) == t * m // 1_000_000, g
        assert kept.get(g, 0) <= groups[g]
    assert set(kept) <= set(targets)


@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["x", "y"]), st.integers(0, 50)),
        min_size=2,
        max_size=40,
    ),
)
@settings(**SET)
def test_quantile_normalize_rank_preserving_within_group(spark, rows):
    """Normalization is rank-preserving within each group (monotone in the
    original score), and every normalized value is a value that EXISTS in
    the global score multiset (nearest-rank discipline)."""
    from flatbread_spark.operators.ranking import quantile_normalize

    data = [(i, g, v) for i, (g, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "id bigint, g string, v bigint")
    out = quantile_normalize(df, "g", "v", "id").collect()
    allvals = {v for _, _, v in data}
    for r in out:
        assert r["norm_score"] in allvals
    by_g = {}
    for r in out:
        by_g.setdefault(r["g"], []).append(r)
    for g, members in by_g.items():
        members.sort(key=lambda r: (r["v"], r["id"]))
        norms = [m["norm_score"] for m in members]
        assert norms == sorted(norms), g
