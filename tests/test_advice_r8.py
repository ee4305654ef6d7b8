"""Round-8 ADVICE regression pins (one test per adjudicated r7 finding).

- quantile_contract oracle must grade the same population as the Spark
  side when ``n_chars`` has NULLs (the operator drops them before ranking;
  the SQL previously ranked every row — latent until a NULL appears);
- containment_dedup oracle must mirror the Spark side for NULL ``text``
  (with_shingles emits ONE empty-string shingle; UNNEST over a NULL list
  emits none — the SQL now coalesces to '');
- cms_build must validate ``weight_col``: NULL weights carry no mass
  (dropped like NULL keys) and a negative weight raises by name instead of
  silently voiding the one-sided est ≥ true guarantee;
- plans/golden.collect_fingerprints must release ONLY the entry module's
  pinned tags, not every pinned frame session-wide — and the tag list must
  stay in sync with what __spark_entry__ actually pins;
- P1/P4 portable-bitmap magics and the sniff=True keyword are pinned in
  tests/test_multimodal_codecs.py (test_pbm_p4_and_p1_decode,
  test_sniff_keyword_and_literal_directory).

Both oracle pins run the REAL entry-module query and the REAL tracked
oracle SQL over a fixture parquet with the adversarial NULLs — the exact
comparison the driver performs, on the population the advice flagged.
"""
import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F


def _write_documents(tmp_path, rows):
    """rows: list of (doc_id, lang, n_chars, text) → documents.parquet."""
    table = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "lang": pa.array([r[1] for r in rows], pa.string()),
            "n_chars": pa.array([r[2] for r in rows], pa.int64()),
            "text": pa.array([r[3] for r in rows], pa.string()),
            "source": pa.array(["t"] * len(rows), pa.string()),
        }
    )
    pq.write_table(table, os.path.join(str(tmp_path), "documents.parquet"))
    return str(tmp_path)


def _oracle_rows(sf_dir, name):
    import __spark_entry__ as entry

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{os.path.join(sf_dir, 'documents.parquet')}')"
    )
    rel = con.sql(entry.oracle_sql()[name])
    cols = [d[0] for d in rel.description]
    return cols, rel.fetchall()


def _norm(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [
        tuple(
            (v.item() if hasattr(v, "item") else v)
            for v in (r[i] for i in order)
        )
        for r in rows
    ]
    return sorted(cols), sorted(out, key=lambda t: tuple(str(x) for x in t))


# ------------------------------------------------- quantile_contract + NULLs

def test_quantile_contract_oracle_ignores_null_values(spark, tmp_path):
    import __spark_entry__ as entry

    rows = [
        (i, "en" if i % 3 else "de", 100 + 7 * i, f"doc {i} text body here")
        for i in range(40)
    ]
    # the adversarial rows: NULL n_chars in both langs — the operator drops
    # them before ranking, so n and every target rank must shrink in the
    # oracle too
    rows += [(100, "en", None, "null-measure en"), (101, "de", None, "null de")]
    sf_dir = _write_documents(tmp_path, rows)

    got = entry.q_quantile_contract(spark, sf_dir)
    g_cols, g_rows = _norm(got.columns, [tuple(r) for r in got.collect()])
    o_cols, o_rows = _norm(*_oracle_rows(sf_dir, "quantile_contract"))
    assert g_cols == o_cols
    assert g_rows == o_rows
    # the boolean contract itself still holds on this population
    assert all(r[tuple(g_cols).index("rank_within_bound")] for r in g_rows)
    # and the populations genuinely exclude the NULL rows: per-lang n is 40
    n_idx = g_cols.index("n")
    assert {r[n_idx] for r in g_rows} <= {13, 14, 26, 27}  # 40 split 2:1


# ------------------------------------------------- containment_dedup + NULLs

def test_containment_oracle_mirrors_null_text(spark, tmp_path):
    import __spark_entry__ as entry

    base_text = (
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
        "kilo lima mike november oscar papa quebec romeo sierra tango"
    )
    rows = [
        (0, "en", 10, base_text),                     # %13==0: planted pair
        (13, "en", 10, None),                         # %13==0 with NULL text
        (26, "en", 10, None),                         # second NULL-text doc
        (39, "de", 10, base_text + " extra tail words here friend"),
        (7, "en", 10, "not selected by the modulus filter at all"),
    ]
    sf_dir = _write_documents(tmp_path, rows)

    got = entry.q_containment_dedup(spark, sf_dir)
    g_cols, g_rows = _norm(got.columns, [tuple(r) for r in got.collect()])
    o_cols, o_rows = _norm(*_oracle_rows(sf_dir, "containment_dedup"))
    assert g_cols == o_cols
    assert g_rows == o_rows
    # the NULL-text docs DO pair up via the single empty-string shingle on
    # BOTH engines (13↔26 and their planted supersets) — the parity the
    # advice flagged as broken
    ids = {frozenset((r[o_cols.index("id_a")], r[o_cols.index("id_b")]))
           for r in o_rows}
    assert frozenset((13, 26)) in ids


# ---------------------------------------------------- cms_build weight guard

def test_cms_build_null_weights_carry_no_mass(spark):
    from flatbread_spark.operators.sketches import cms_build, cms_estimate

    rows = [("a", 5), ("a", None), ("b", 3), ("b", None), ("c", None)]
    df = spark.createDataFrame(rows, "k string, w bigint")
    cells = cms_build(df, "k", depth=4, width=64, weight_col="w")
    # total mass = sum of one row's cells = 5 + 3 (NULL rows dropped, and
    # no NULL cell values stored anywhere)
    per_row = {r["r"]: r["tot"] for r in
               cells.groupBy("r").agg(F.sum("cell").alias("tot")).collect()}
    assert set(per_row.values()) == {8}
    assert cells.filter(F.col("cell").isNull()).count() == 0
    est = {r["k"]: r["cms_est"] for r in
           cms_estimate(cells, df.select("k").distinct(), "k",
                        depth=4, width=64).collect()}
    assert est["a"] >= 5 and est["b"] >= 3  # upward bias intact
    assert est["c"] >= 0


def test_cms_build_negative_weight_raises(spark):
    from flatbread_spark.operators.sketches import cms_build

    df = spark.createDataFrame([("a", 5), ("b", -1)], "k string, w bigint")
    cells = cms_build(df, "k", depth=2, width=16, weight_col="w")
    with pytest.raises(Exception, match="negative weight"):
        cells.collect()


# ------------------------------------------------ golden.py release scoping

def test_golden_reset_spares_unrelated_pins(spark):
    from flatbread_spark.cache import pin, pinned_tags, release
    from flatbread_spark.plans.golden import ENTRY_PIN_TAGS

    mine = pin(spark.range(3).toDF("x"), tag="advice-r8-unrelated")
    try:
        entry_like = pin(spark.range(2).toDF("y"), tag=ENTRY_PIN_TAGS[0])
        assert entry_like.storageLevel.useMemory
        # the exact reset collect_fingerprints performs between queries
        for tag in ENTRY_PIN_TAGS:
            release(tag=tag)
        tags = pinned_tags()
        assert "advice-r8-unrelated" in tags          # unrelated pin survives
        assert not any(t in tags for t in ENTRY_PIN_TAGS)
        assert mine.storageLevel.useMemory or mine.storageLevel.useDisk
    finally:
        release(tag="advice-r8-unrelated")


def test_entry_pin_tags_in_sync_with_entry_module():
    """ENTRY_PIN_TAGS must list every tag __spark_entry__ pins under —
    a new pin(tag=...) in the entry module without a matching golden entry
    would leak InMemoryTableScan nodes into later fingerprints again."""
    import re

    import __spark_entry__ as entry
    from flatbread_spark.plans.golden import ENTRY_PIN_TAGS

    src = open(entry.__file__).read()
    used = set(re.findall(r'tag="([^"]+)"', src))
    assert used == set(ENTRY_PIN_TAGS)
