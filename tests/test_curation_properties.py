"""Property sweeps for the curation/privacy audits against Python
replays: majority-vote label reconciliation (NULL abstentions, vote
ties to the smallest label, exact ppm agreement) and the k-anonymity /
l-diversity class-size summary."""
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SET = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

votes = st.lists(
    st.tuples(
        st.integers(0, 3),
        st.one_of(st.none(), st.sampled_from(["pos", "neg", "spam"])),
    ),
    min_size=1, max_size=16,
)


@given(rows=votes)
@settings(**SET)
def test_label_vote_matches_python(spark, rows):
    from flatbread_spark.operators.curation import label_vote

    df = spark.createDataFrame(rows, "item bigint, lab string")
    got = {
        r["item"]: (
            r["label"], r["n_votes"], r["n_winner"],
            r["agreement_ppm"], r["n_labels"],
        )
        for r in label_vote(df, "item", "lab").collect()
    }
    expect = {}
    by_item = {}
    for item, lab in rows:
        if lab is None:
            continue  # abstention
        by_item.setdefault(item, {}).setdefault(lab, 0)
        by_item[item][lab] += 1
    for item, counts in by_item.items():
        winner = min(counts, key=lambda l: (-counts[l], l))
        n_votes = sum(counts.values())
        n_win = counts[winner]
        expect[item] = (
            winner, n_votes, n_win,
            n_win * 1_000_000 // n_votes, len(counts),
        )
    assert got == expect


rows_strategy = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),      # quasi 1
        st.integers(0, 2),                 # quasi 2
        st.sampled_from(["x", "y"]),      # sensitive
    ),
    min_size=1, max_size=16,
)


@given(rows=rows_strategy, k=st.sampled_from([1, 2, 3]))
@settings(**SET)
def test_k_anonymity_matches_python(spark, rows, k):
    from flatbread_spark.operators.privacy import k_anonymity

    df = spark.createDataFrame(rows, "q1 string, q2 bigint, s string")
    r = k_anonymity(df, ["q1", "q2"], k=k, sensitive_col="s").collect()[0]
    classes = {}
    for q1, q2, s in rows:
        classes.setdefault((q1, q2), []).append(s)
    sizes = [len(v) for v in classes.values()]
    assert r["n_rows"] == len(rows)
    assert r["n_classes"] == len(classes)
    assert r["min_class"] == min(sizes) and r["max_class"] == max(sizes)
    assert r["n_below_k_classes"] == sum(1 for n in sizes if n < k)
    assert r["n_rows_below_k"] == sum(n for n in sizes if n < k)
    assert r["n_homogeneous"] == sum(
        1 for v in classes.values() if len(set(v)) == 1
    )
