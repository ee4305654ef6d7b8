"""Sequence packing: the two-phase global cumsum must equal the single-window
reference, and pack geometry must be internally consistent."""
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def packed(spark, documents):
    from flatbread_spark.functions.text import token_count
    from flatbread_spark.operators.packing import pack_sequences

    return pack_sequences(
        documents.select("doc_id", "text"),
        key_col="doc_id",
        tokens_col=token_count(F.col("text")),
        ctx_len=256,
        salt=":t",
        num_partitions=7,
    ).select("doc_id", "n_tokens", "cum_tokens", "pack_id", "pack_offset", "n_splits")


def test_cumsum_matches_single_window(spark, documents):
    from flatbread_spark.functions.text import token_count
    from flatbread_spark.operators.packing import scalable_cumsum

    staged = documents.select(
        "doc_id",
        token_count(F.col("text")).alias("tok"),
        F.md5(F.col("doc_id").cast("string")).alias("k"),
    )
    two_phase = scalable_cumsum(
        staged, [F.col("k"), F.col("doc_id")], "tok", out_col="cum", num_partitions=5
    ).select("doc_id", "cum")
    w = Window.orderBy("k", "doc_id").rowsBetween(Window.unboundedPreceding, 0)
    ref = staged.select("doc_id", F.sum("tok").over(w).cast("bigint").alias("cum"))
    assert (
        two_phase.join(ref, "doc_id")
        .filter(two_phase["cum"] != ref["cum"])
        .count()
        == 0
    )
    assert two_phase.count() == documents.count()


def test_pack_geometry(packed):
    rows = sorted(packed.collect(), key=lambda r: (r.cum_tokens, r.doc_id))
    prev_cum = 0
    for r in rows:
        start = r.cum_tokens - r.n_tokens
        assert start == prev_cum, "token stream must be gapless"
        assert r.pack_id == start // 256
        assert r.pack_offset == start % 256
        assert r.n_splits == (r.cum_tokens - 1) // 256 - start // 256
        prev_cum = r.cum_tokens


def test_packing_deterministic_under_repartition(spark, documents):
    from flatbread_spark.functions.text import token_count
    from flatbread_spark.operators.packing import pack_sequences

    def run(df, parts):
        return {
            (r.doc_id, r.pack_id, r.pack_offset)
            for r in pack_sequences(
                df.select("doc_id", "text"),
                key_col="doc_id",
                tokens_col=token_count(F.col("text")),
                ctx_len=512,
                salt=":t",
                num_partitions=parts,
            ).collect()
        }

    assert run(documents, 3) == run(documents.repartition(11), 8)


def test_build_packs_exact_windows(spark, documents):
    from flatbread_spark.functions.text import token_count
    from flatbread_spark.operators.packing import build_packs, pack_sequences

    assigned = pack_sequences(
        documents.select("doc_id", "text"),
        key_col="doc_id",
        tokens_col=token_count(F.col("text")),
        ctx_len=256,
        salt=":t",
    )
    packs = sorted(build_packs(assigned, "text", 256).collect(),
                   key=lambda r: r.pack_id)
    total = assigned.agg(F.max("cum_tokens")).first()[0]
    assert [r.pack_id for r in packs] == list(range(len(packs)))
    # every pack holds exactly ctx_len tokens except the final remainder
    for r in packs[:-1]:
        assert r.n_tokens == 256, r
    assert packs[-1].n_tokens == total - 256 * (len(packs) - 1)
    assert sum(r.n_tokens for r in packs) == total


def test_build_packs_content_roundtrip(spark, documents):
    from flatbread_spark.functions.text import token_count
    from flatbread_spark.operators.packing import build_packs, pack_sequences
    import hashlib

    docs = documents.select("doc_id", "text").limit(40)
    assigned = pack_sequences(
        docs, key_col="doc_id", tokens_col=token_count(F.col("text")),
        ctx_len=64, salt=":t",
    )
    # reference: concatenate the token stream in assignment order, slice it
    rows = sorted(assigned.collect(), key=lambda r: r.cum_tokens)
    stream = []
    for r in rows:
        stream.extend(r.text.strip().split())
    expected = {}
    for p in range(0, (len(stream) + 63) // 64):
        seg = stream[p * 64:(p + 1) * 64]
        expected[p] = hashlib.md5(" ".join(seg).encode()).hexdigest()
    got = {r.pack_id: r.content_md5
           for r in build_packs(assigned, "text", 64).collect()}
    assert got == expected


def test_zero_token_docs_do_not_corrupt_packs(spark):
    from flatbread_spark.operators.packing import build_packs, pack_sequences

    # doc 2 has 0 tokens and lands exactly on the 4-token pack boundary
    df = spark.createDataFrame(
        [(1, "a b c d", 4), (2, "", 0), (3, "e f g h", 4)],
        "doc_id long, text string, tok long",
    )
    assigned = pack_sequences(df, key_col="doc_id", tokens_col=F.col("tok"),
                              ctx_len=4, salt=":z")
    assert assigned.filter(F.col("n_splits") < 0).count() == 0
    packs = build_packs(assigned, "text", 4).collect()
    assert sorted((r.pack_id, r.n_tokens, r.n_segments) for r in packs) == [
        (0, 4, 1), (1, 4, 1)
    ]


# ------------------------------------------------------------- truncation_curve
class TestTruncationCurve:
    def test_matches_python(self, spark):
        from flatbread_spark.operators.packing import truncation_curve

        toks = [10, 100, 1000, 5000, 3]
        df = spark.createDataFrame([(t,) for t in toks], "tok bigint")
        Ls = [8, 512, 2048]
        got = {
            r["seq_len"]: (r["n_docs"], r["n_truncated"], r["total_tokens"],
                           r["tokens_lost"], r["lost_ppm"])
            for r in truncation_curve(df, "tok", Ls).collect()
        }
        tot = sum(toks)
        for L in Ls:
            lost = sum(max(t - L, 0) for t in toks)
            trunc = sum(1 for t in toks if t > L)
            assert got[L] == (
                len(toks), trunc, tot, lost, lost * 1_000_000 // tot
            ), L

    def test_monotone_in_length(self, spark):
        from flatbread_spark.operators.packing import truncation_curve

        df = spark.createDataFrame([(t,) for t in range(1, 200)], "tok bigint")
        rows = truncation_curve(df, "tok", [10, 50, 100, 400]).orderBy(
            "seq_len"
        ).collect()
        losses = [r["lost_ppm"] for r in rows]
        assert losses == sorted(losses, reverse=True)
        assert losses[-1] == 0  # 400 > max token count

    def test_validation(self, spark):
        import pytest as _pytest

        from flatbread_spark.operators.packing import truncation_curve

        df = spark.createDataFrame([(1,)], "tok bigint")
        with _pytest.raises(ValueError):
            truncation_curve(df, "tok", [0, 10])
