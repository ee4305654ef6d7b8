"""embedding_contamination property sweep (VERDICT r8 #6): random bipartite
train/eval splits graded against a pure-Python brute-force k=1 oracle that
replays the engine's exact-cosine discipline (dot_exact: per-product
round(·,12) + decimal accumulation; HALF_UP 6-digit cosine; nearest =
(cos desc, train id asc); self-id exclusion), plus the defective-vector
corners (NULL / ragged train vectors — the ones vector_audit exists to
catch upstream) pinned by name.

Integer-component vectors keep the product/accumulation arithmetic exact in
both engines, so any mismatch is a semantics bug, not float noise — the
same trick as tests/test_graph_properties.py's pure-Python oracles.
"""
import math
from decimal import ROUND_HALF_UP, Decimal

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

DIM = 6
THRESHOLD = 0.5


def _rhu6(x: float) -> float:
    # Spark's round(double, 6): BigDecimal.valueOf (shortest repr) HALF_UP —
    # same as Python Decimal(repr(x)).
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP))


def _cos6(a, b):
    # integer components -> dot_exact's round(prod,12)+decimal sum is the
    # plain integer dot; norms/division are IEEE double in both engines
    dot = float(sum(x * y for x, y in zip(a, b)))
    na = math.sqrt(float(sum(x * x for x in a)))
    nb = math.sqrt(float(sum(x * x for x in b)))
    return _rhu6(dot / (na * nb))


def _py_oracle(train, ev, threshold):
    """train/ev: list[(id, vec)] -> {eval_id: (train_id, cos, flag)};
    eval rows with no admissible candidate (every train id == eval id)
    emit nothing, mirroring the operator's join shape."""
    out = {}
    for eid, evec in ev:
        cands = [
            (_cos6(evec, tvec), tid) for tid, tvec in train if tid != eid
        ]
        if not cands:
            continue
        # (cos desc, id asc): max by cos, then min id among the tied
        best_cos = max(c for c, _ in cands)
        tid = min(t for c, t in cands if c == best_cos)
        out[eid] = (tid, best_cos, best_cos >= threshold)
    return out


def _vec(rnd_ints):
    return [float(x) for x in rnd_ints]


nonzero_vec = (
    st.lists(st.integers(min_value=-2, max_value=2), min_size=DIM, max_size=DIM)
    .filter(lambda v: any(v))
)


@st.composite
def bipartite(draw):
    n_train = draw(st.integers(min_value=1, max_value=8))
    n_eval = draw(st.integers(min_value=1, max_value=5))
    train_ids = draw(
        st.lists(
            st.integers(min_value=0, max_value=30),
            min_size=n_train, max_size=n_train, unique=True,
        )
    )
    # eval ids may COLLIDE with train ids (exercises the self-exclusion)
    eval_ids = draw(
        st.lists(
            st.integers(min_value=0, max_value=30),
            min_size=n_eval, max_size=n_eval, unique=True,
        )
    )
    train = [(i, _vec(draw(nonzero_vec))) for i in train_ids]
    ev = [(i, _vec(draw(nonzero_vec))) for i in eval_ids]
    return train, ev


@given(split=bipartite())
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_embedding_contamination_matches_python_oracle(spark, split):
    from flatbread_spark.operators.dedup import embedding_contamination

    train, ev = split
    tdf = spark.createDataFrame(train, "vec_id bigint, embedding array<float>")
    edf = spark.createDataFrame(ev, "vec_id bigint, embedding array<float>")
    got = {
        r["eval_id"]: (r["train_id"], r["cos"], r["is_contaminated"])
        for r in embedding_contamination(
            tdf, edf, "vec_id", "embedding", threshold=THRESHOLD
        ).collect()
    }
    assert got == _py_oracle(train, ev, THRESHOLD)


def test_defective_train_vectors_never_outrank_healthy(spark):
    """NULL and ragged train vectors produce NULL cosine (dot_exact
    null-propagates), which sorts AFTER every healthy candidate in the
    (cos desc, id asc) ranking — a defective vector can neither win the
    nearest-neighbor slot nor flag contamination. vector_audit is the
    upstream gate that counts these defects; this pins what happens if
    they leak through anyway."""
    from flatbread_spark.operators.dedup import embedding_contamination

    train = spark.createDataFrame(
        [
            (1, None),                      # NULL vector
            (2, [1.0, 0.0]),                # ragged (dim 2, corpus dim 4)
            (3, [0.0, 1.0, 0.0, 0.0]),      # healthy but orthogonal
        ],
        "vec_id bigint, embedding array<float>",
    )
    ev = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0, 0.0])], "vec_id bigint, embedding array<float>"
    )
    r = embedding_contamination(train, ev, "vec_id", "embedding").collect()
    assert len(r) == 1
    # the healthy orthogonal candidate (cos 0.0) beats both defects
    assert r[0]["train_id"] == 3
    assert r[0]["cos"] == 0.0
    assert r[0]["is_contaminated"] is False


def test_all_candidates_self_excluded_emits_no_row(spark):
    """An eval id whose only train rows share its id gets NO output row
    (the id contract: disjoint splits are the caller's job; byte-identical
    presence is dedup_exact's)."""
    from flatbread_spark.operators.dedup import embedding_contamination

    v = [1.0, 0.0, 0.0]
    train = spark.createDataFrame(
        [(5, v)], "vec_id bigint, embedding array<float>"
    )
    ev = spark.createDataFrame(
        [(5, v), (6, v)], "vec_id bigint, embedding array<float>"
    )
    rows = embedding_contamination(train, ev, "vec_id", "embedding").collect()
    assert [(r["eval_id"], r["train_id"]) for r in rows] == [(6, 5)]


def test_vector_audit_counts_the_contamination_input_defects(spark):
    """The documented upstream gate: one pass counts exactly the defect
    classes the sweep above excludes by construction."""
    from flatbread_spark.operators.curation import vector_audit

    df = spark.createDataFrame(
        [
            (1, [1.0, 2.0, 3.0]),
            (2, None),
            (3, [1.0, 2.0]),            # ragged
            (4, [0.0, 0.0, 0.0]),       # zero
            (5, [float("nan"), 1.0, 2.0]),
            (6, [2.0, 2.0, 1.0]),
        ],
        "vec_id bigint, embedding array<float>",
    )
    r = vector_audit(df, "vec_id", "embedding").collect()[0]
    assert (r["n_vecs"], r["n_null"], r["n_ragged"], r["n_nan"], r["n_zero"]) == (
        6, 1, 1, 1, 1,
    )
    assert r["dim"] == 3
