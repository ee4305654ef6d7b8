"""Round-8 additions: Cohen's-kappa rater agreement and embedding-space
eval decontamination.

rater_agreement pins (pure-Python kappa oracle on every case):
- perfect agreement, perfect DISagreement (negative kappa — the
  pmod-floor division both engines replay; Spark div truncates toward
  zero, so a naive div would be off by one on negatives);
- NULL abstentions dropped from both observed and expected terms;
- degenerate pe = 1e6 (both raters constant and equal) -> kappa 0;
- categorical (3-label) marginals incl. labels present on one side only;
- the empty frame -> a single all-zero row.

embedding_contamination pins: exact nearest-train per eval, the id
contract (equal ids excluded), threshold flag, determinism tie-break.
"""
import pytest
from pyspark.sql import functions as F


def _py_kappa(pairs):
    pairs = [(a, b) for a, b in pairs if a is not None and b is not None]
    n = len(pairs)
    if n == 0:
        return (0, 0, 0, 0, 0)
    agree = sum(1 for a, b in pairs if a == b)
    po = (agree * 1_000_000) // n
    ca, cb = {}, {}
    for a, b in pairs:
        ca[a] = ca.get(a, 0) + 1
        cb[b] = cb.get(b, 0) + 1
    pe_num = sum(ca.get(l, 0) * cb.get(l, 0) for l in set(ca) | set(cb))
    pe = (pe_num * 1_000_000) // (n * n)
    if pe >= 1_000_000:
        k = 0
    else:
        k = ((po - pe) * 1_000_000) // (1_000_000 - pe)  # python // floors
    return (n, agree, po, pe, k)


def _run_kappa(spark, pairs):
    from flatbread_spark.operators.curation import rater_agreement

    df = spark.createDataFrame(
        pairs or [(None, None)], "a string, b string"
    )
    r = rater_agreement(df, "a", "b").collect()[0]
    return (r["n"], r["n_agree"], r["po_ppm"], r["pe_ppm"], r["kappa_ppm"])


CASES = [
    # perfect agreement (pe < 1e6 because two categories)
    [("x", "x")] * 3 + [("y", "y")] * 2,
    # perfect disagreement on two balanced labels -> kappa -1e6
    [("x", "y"), ("y", "x"), ("x", "y"), ("y", "x")],
    # NEGATIVE non-integer kappa: floor vs truncate differ -> the pin
    [("x", "y"), ("y", "x"), ("x", "x"), ("y", "y"), ("x", "y")],
    # NULL abstentions dropped
    [("x", None), (None, "y"), ("x", "x"), (None, None)],
    # degenerate: both constant and equal -> pe = 1e6 -> kappa 0
    [("x", "x")] * 4,
    # both constant and DIFFERENT -> pe ... po=0
    [("x", "y")] * 4,
    # 3 categories, one label only on one side
    [("a", "a"), ("b", "c"), ("c", "c"), ("a", "b"), ("b", "b"), ("c", "a")],
]


@pytest.mark.parametrize("case", range(len(CASES)))
def test_rater_agreement_matches_python(spark, case):
    pairs = CASES[case]
    assert _run_kappa(spark, pairs) == _py_kappa(pairs)


def test_rater_agreement_negative_kappa_floors(spark):
    """The sign-sensitive division: kappa dividend negative and not a
    multiple of the divisor — floor (not truncate-toward-zero) on both
    engines. Case 2 of CASES has po=400000, pe=500000 ->
    kappa = -200000 exactly; build one where it is fractional."""
    pairs = [("x", "y"), ("y", "x"), ("x", "x")]
    got = _run_kappa(spark, pairs)
    want = _py_kappa(pairs)
    assert got == want
    assert want[4] < 0  # genuinely negative
    # and genuinely non-integral before flooring: floor != trunc
    po, pe = want[2], want[3]
    assert ((po - pe) * 1_000_000) % (1_000_000 - pe) != 0


def test_rater_agreement_empty(spark):
    assert _run_kappa(spark, []) == (0, 0, 0, 0, 0)


def test_rater_agreement_bool_columns(spark):
    from flatbread_spark.operators.curation import rater_agreement

    df = spark.createDataFrame(
        [(True, True), (True, False), (False, False), (False, False)],
        "a boolean, b boolean",
    )
    r = rater_agreement(df, "a", "b").collect()[0]
    assert (r["n"], r["n_agree"]) == (4, 3)
    assert r["po_ppm"] == 750_000
    # pe = (2*1 + 2*3)/16 = 0.5 -> 500000; kappa = .25/.5 = 500000
    assert r["pe_ppm"] == 500_000
    assert r["kappa_ppm"] == 500_000


def test_rater_agreement_single_lineage_plan(spark):
    """Round-9 plan contract: the input frame is consumed by exactly ONE
    lineage (one scan, no joins, no Filter nodes). The round-8 form derived
    obs/marginals as three lineages (three scans, re-computing upstream
    label expressions each time), and a key Filter — before OR after the
    contingency aggregate — gets pushed below the label Project by
    Catalyst, re-evaluating the label expression trees per corpus row
    (CodegenFallback HOF stages have no subexpression elimination; the
    NULL-abstention drop lives inside the explode projection instead)."""
    from flatbread_spark.operators.curation import rater_agreement

    df = spark.createDataFrame(
        [("x", "x"), ("x", None), ("y", "x")], "a string, b string"
    )
    out = rater_agreement(df, "a", "b")
    out.collect()  # materialize so the AQE plan is final
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]  # AQE prints both sections
    assert final.count("Scan ExistingRDD") == 1, final
    for node in ("Filter", "Join", "CartesianProduct", "BroadcastNestedLoop"):
        assert node not in final, f"unexpected {node} node:\n{final}"


def test_embedding_contamination_exact_and_flags(spark):
    from flatbread_spark.operators.dedup import embedding_contamination

    def v(*xs):
        return [float(x) for x in xs] + [0.0] * 60

    train = spark.createDataFrame(
        [
            (10, v(1, 0, 0, 0)),
            (11, v(0, 1, 0, 0)),
            (12, v(1, 1, 0, 0)),
        ],
        "vec_id bigint, embedding array<float>",
    )
    ev = spark.createDataFrame(
        [
            (1, v(1, 0.1, 0, 0)),   # nearest train 10, cos high -> flagged
            (2, v(0, 0, 1, 0)),     # orthogonal to all -> cos 0, clean
        ],
        "vec_id bigint, embedding array<float>",
    )
    rows = {
        r["eval_id"]: r
        for r in embedding_contamination(
            train, ev, "vec_id", "embedding", threshold=0.9
        ).collect()
    }
    assert rows[1]["train_id"] == 10
    assert rows[1]["is_contaminated"]
    assert rows[1]["cos"] > 0.99
    assert not rows[2]["is_contaminated"]
    assert rows[2]["cos"] == 0.0
    # one row per eval vector, even the clean one
    assert set(rows) == {1, 2}


def test_embedding_contamination_tie_breaks_to_lowest_train_id(spark):
    from flatbread_spark.operators.dedup import embedding_contamination

    vec = [1.0] + [0.0] * 63
    train = spark.createDataFrame(
        [(7, vec), (3, vec)], "vec_id bigint, embedding array<float>"
    )
    ev = spark.createDataFrame(
        [(100, vec)], "vec_id bigint, embedding array<float>"
    )
    r = embedding_contamination(train, ev, "vec_id", "embedding").collect()[0]
    assert r["train_id"] == 3  # (cos desc, id asc)


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@given(
    pairs=st.lists(
        st.tuples(
            st.one_of(st.none(), st.sampled_from(["a", "b", "c"])),
            st.one_of(st.none(), st.sampled_from(["a", "b", "c"])),
        ),
        max_size=20,
    )
)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_rater_agreement_property_sweep(spark, pairs):
    """Random labelings (3 categories + NULL abstentions, heavy ties) vs
    the pure-Python kappa oracle — every output field exact."""
    assert _run_kappa(spark, pairs) == _py_kappa(pairs)
