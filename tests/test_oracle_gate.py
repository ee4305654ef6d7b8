"""Driver-harness parity gate, runnable from pytest.

Runs ``scripts/check_oracle.py`` in a SUBPROCESS with
``CHECK_ORACLE_VANILLA=1`` — a default SparkSession with none of the
engine's session conf — over the queries that have historically broken on
environment shifts (the r1 nanosAsLong regression, the r3 TIMESTAMP_NTZ
break, the r1–r3 Row-attr hash mismatch). A subprocess is required: in
this pytest process ``getOrCreate`` would return the conftest session and
the "vanilla" run wouldn't be vanilla.

Scope is the fragile subset at sf0.001 so the gate stays fast; the full
sweep at sf0.01 is the pre-commit loop documented in check_oracle.py.
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# config-coupled queries: event-time family (ts dtype), value_counts family
# (Row-attr columns + apportioned rounding), binned_counts (label rendering)
FRAGILE = [
    "events_hourly", "sessions", "asof_attribution", "range_join",
    "funnel", "cohort_retention",
    "value_counts_pct", "value_counts_pct_raw", "binned_counts",
    # round-4 cross-engine arithmetic contracts: scaled-integer k-means,
    # decimal-RMSE quantization, md5-ordered packing/assembly — the places
    # a Spark default change (ANSI mode, round semantics, session TZ)
    # would diverge from DuckDB first
    "kmeans_embeddings", "quantize_embeddings", "pack_sequences",
    "build_packs", "trigram_typicality", "curation_funnel",
]


def test_vanilla_oracle_gate_on_fragile_queries():
    env = dict(os.environ, CHECK_ORACLE_VANILLA="1", CHECK_ORACLE_CPUS="4",
               CHECK_ORACLE_PARTITIONS="4")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "check_oracle.py"),
         "/root/testdata/sf0.001", *FRAGILE],
        env=env, capture_output=True, text=True, timeout=480,
    )
    assert proc.returncode == 0, (
        f"vanilla oracle gate failed:\n{proc.stdout[-4000:]}\n{proc.stderr[-2000:]}"
    )
    assert "all queries match" in proc.stdout


def test_type_guard_catches_width_drift():
    """Unit test of the check_oracle cross-engine type guard (the r4 HUGEINT
    lesson): width drift flagged, exact matches pass, unmapped/complex
    types skipped, timestamps always flagged."""
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from check_oracle import type_mismatches

    spark_dtypes = [
        ("n", "bigint"), ("pct", "double"), ("v", "string"),
        ("arr", "array<double>"), ("d", "decimal(27,6)"),
    ]
    # exact parity → clean
    assert type_mismatches(
        spark_dtypes,
        ["n", "pct", "v", "arr", "d"],
        ["BIGINT", "DOUBLE", "VARCHAR", "DOUBLE[]", "DECIMAL(27,6)"],
    ) == []
    # HUGEINT promotion → flagged
    bad = type_mismatches(spark_dtypes, ["n"], ["HUGEINT"])
    assert bad == [("n", "bigint", "HUGEINT")]
    # float-vs-double and decimal-scale drift → flagged
    assert type_mismatches(spark_dtypes, ["pct"], ["FLOAT"])
    assert type_mismatches(spark_dtypes, ["d"], ["DECIMAL(38,12)"])
    # timestamps are always a hazard (repo convention: cast to string/ns)
    assert type_mismatches([("ts", "timestamp")], ["ts"], ["TIMESTAMP WITH TIME ZONE"])
    assert type_mismatches([("ts", "timestamp_ntz")], ["ts"], ["TIMESTAMP"])
    # column missing on the duck side is the main compare's job, not ours
    assert type_mismatches(spark_dtypes, ["other"], ["BIGINT"]) == []


def test_value_comparator_sensitivity():
    """Negative controls for the gate's own comparator: the pieces that
    decide pass/fail must themselves be provably sensitive. The driver
    hashes BYTES, so the local stand-in repr-compares floats — -0.0 vs
    0.0 and a last-ulp drift must FAIL here even though == calls them
    equal; NaN must compare EQUAL to NaN (both engines emit it for
    defined NaN results); and the multiset row-compare must be blind to
    row/column order yet catch a single changed cell."""
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from check_oracle import norm_cell, norm_rows

    assert norm_cell(-0.0) != norm_cell(0.0)
    x = 48.5
    assert norm_cell(x) != norm_cell(x + 2**-46)  # last-ulp drift fails
    assert norm_cell(float("nan")) == norm_cell(float("nan"))
    assert norm_cell(None) is None

    cols = ["b", "a"]
    spark_rows = [(1, "x"), (2, "y")]
    # same multiset, different row order and pre-sorted column order
    duck_rows = [(2, "y"), (1, "x")]
    assert norm_rows(cols, spark_rows) == norm_rows(cols, duck_rows)
    # one changed cell is caught
    assert norm_rows(cols, spark_rows) != norm_rows(cols, [(1, "x"), (2, "z")])
    # a renamed column changes the key even with identical values
    assert norm_rows(["b", "c"], spark_rows)[0] != norm_rows(cols, spark_rows)[0]
