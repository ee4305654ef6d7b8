"""Property sweep for fuzzy_match_pairs against a brute-force Python
oracle: random tie-heavy name pools (small alphabet so near-pairs are
dense) must produce exactly the blocked within-max_dist Levenshtein
pairs with the right per-spelling row counts. Pins the contract edges:
exact duplicates collapse (never pairs), cross-block near-misses are
by-design missed (blocking recall trade), NULL names dropped."""
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SET = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# names: "<first> <tail>" where first ∈ 2 blocks and tails are short
# strings over a 3-letter alphabet — dense near-duplicates by design
first = st.sampled_from(["acme", "zorg"])
tail = st.text(alphabet="abc", min_size=0, max_size=4)
name = st.builds(lambda f, t: (f + " " + t).strip(), first, tail)
pool = st.lists(st.one_of(name, st.none()), min_size=1, max_size=18)


def lev(a, b):
    if a == b:
        return 0
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def py_pairs(names, max_dist):
    kept = [n for n in names if n is not None]
    counts = {}
    for n in kept:
        counts[n] = counts.get(n, 0) + 1
    blocks = {}
    for n in counts:
        blocks.setdefault(re.split(r"\s+", n.strip().lower())[0], []).append(n)
    out = {}
    for members in blocks.values():
        members = sorted(members)
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                d = lev(members[i], members[j])
                if 0 < d <= max_dist:
                    out[(members[i], members[j])] = (
                        d, counts[members[i]], counts[members[j]]
                    )
    return out


@given(names=pool, max_dist=st.sampled_from([1, 2]))
@settings(**SET)
def test_fuzzy_pairs_match_bruteforce(spark, names, max_dist):
    from flatbread_spark.operators.linkage import fuzzy_match_pairs

    df = spark.createDataFrame([(n,) for n in names], "name string")
    got = {}
    for r in fuzzy_match_pairs(df, "name", max_dist).collect():
        a, b = sorted((r["name_a"], r["name_b"]))
        got[(a, b)] = (
            r["dist"],
            r["n_a"] if (a, b) == (r["name_a"], r["name_b"]) else r["n_b"],
            r["n_b"] if (a, b) == (r["name_a"], r["name_b"]) else r["n_a"],
        )
    assert got == py_pairs(names, max_dist)
