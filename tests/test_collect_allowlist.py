"""Mechanical enforcement of the bounded-collect audit (round 10).

Every `.collect()` / `.toPandas()` in package source pulls a DataFrame to
the driver — at 100 TB that is only safe when the frame is bounded by the
MODEL or the GROUP STRUCTURE, never the corpus. VERDICT r8/r9 verified
this by hand ("all 20 collect sites are bounded"); this test turns the
manual audit into a ratchet, the same discipline as
``tests/test_scan_budgets.py`` for scan counts and
``tests/test_filter_audit.py`` for expensive filters: a NEW driver-side
materialization anywhere in ``flatbread_spark/`` fails by file name until
this allowlist is edited in the same diff, where the commit message has to
state the bound.

Counts (not line numbers) so ordinary refactors don't churn the test; the
per-file bound notes are the audit trail.
"""
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "flatbread_spark")

# file (relative to flatbread_spark/) -> (collect_count, bound note)
COLLECT_ALLOWLIST = {
    "operators/tokenizer.py": (1, "BPE pair-count table: vocabulary-bounded (top pairs after min_count)"),
    "operators/sampling.py": (3, "group counts for exact allocation (group-bounded) + 1-row FPS seed + greedy FPS state (k rows, k = requested sample)"),
    "operators/kmeans.py": (2, "k seed vectors + per-(cluster,dim) update rows: both k*dim model-bounded"),
    "operators/trend.py": (2, "single aggregate rows (slope/anomaly scalars): 1 row each"),
    "operators/pca.py": (2, "d*d covariance moments + d-row component table: dimension-bounded"),
    "operators/graph.py": (2, "union-find edge probe hard-capped at driver_max_edges+1 (fails loudly past the cap) + 1-row count"),
    "operators/lm.py": (1, "trigram LM model table: vocabulary-bounded (min_count-filtered)"),
    "operators/ranking.py": (3, "per-partition boundary stats (partitions rows) + range-bound rows + 1-row total"),
    "operators/curation.py": (1, "per-gate funnel summary: gate-count rows"),
    "output/tablespec.py": (2, "display/export sink: truncation-limited presentation rows by contract"),
    "output/excel.py": (1, "export sink: presentation-sized by contract (same class as tablespec)"),
}
TOPANDAS_ALLOWLIST = {
    "frame.py": (1, "FlatFrame.to_pandas(): presentation sink for margin tables, documented driver-sized"),
}

_CALL = {
    ".collect(": COLLECT_ALLOWLIST,
    ".toPandas(": TOPANDAS_ALLOWLIST,
}


def _count_calls(needle):
    found = {}
    for root, _dirs, files in os.walk(PKG):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(root, fn)
            rel = os.path.relpath(path, PKG)
            n = 0
            with open(path) as f:
                for line in f:
                    stripped = line.split("#", 1)[0]
                    n += stripped.count(needle)
            if n:
                found[rel] = n
    return found


def test_every_collect_site_is_allowlisted_with_a_bound():
    for needle, allow in _CALL.items():
        found = _count_calls(needle)
        expected = {f: c for f, (c, _note) in allow.items()}
        new_files = set(found) - set(expected)
        assert not new_files, (
            f"new driver-side {needle}) site(s) in {sorted(new_files)} — "
            "state the bound in tests/test_collect_allowlist.py"
        )
        gone = set(expected) - set(found)
        assert not gone, (
            f"allowlist is stale: {sorted(gone)} no longer call {needle}) — "
            "remove the entry so the ratchet stays tight"
        )
        for f in found:
            assert found[f] == expected[f], (
                f"{f}: {found[f]} {needle}) sites, allowlist says {expected[f]} "
                "— a new one needs its bound documented, a removed one "
                "ratchets the count down"
            )


def test_no_iterative_collect_in_loops_over_unbounded_frames():
    """Spot-guard for the worst pattern: `.collect()` inside a `for` that
    also iterates DataFrame rows (driver-side join). The known iterative
    collects (kmeans per-iteration update, FPS greedy state) live inside
    loops bounded by `iters`/`k` — assert no NEW file grows a
    collect-in-for outside the allowlisted files."""
    allowed = {
        # bounded iterative algorithms: loop trip count is a MODEL
        # parameter (iters / k / n_merges / max_iter) and each in-loop
        # collect is 1-row (argmax / convergence sum) or k-row
        "operators/kmeans.py",
        "operators/sampling.py",
        "operators/tokenizer.py",
        "operators/graph.py",
    }
    offenders = []
    for root, _dirs, files in os.walk(PKG):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(root, fn)
            rel = os.path.relpath(path, PKG)
            src = open(path).read()
            # crude but effective: a for-loop body containing .collect(
            for m in re.finditer(r"^(\s*)for .*:\n((?:\1\s+.*\n?)+)", src, re.M):
                if ".collect(" in m.group(2) and rel not in allowed:
                    offenders.append(rel)
    assert not offenders, (
        f"collect() inside a loop in {sorted(set(offenders))} — bound it by "
        "the model (iters/k) and allowlist it, or restructure"
    )
