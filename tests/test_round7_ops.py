"""Round-7 operators: chunk_windows (RAG windowing), hashed linear
classifier, bloom membership, vocabulary coverage.

Same discipline as test_round6_ops: each operator is checked against an
independent pure-Python re-implementation of its contract, plus the
determinism / plan properties its module docstring promises.
"""
import hashlib
import re

import pytest
from pyspark.sql import functions as F


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_chunks(doc_id, text, window, stride, min_words=1):
    words = re.split(r"\s+", text.strip())
    n = len(words)
    nc = 1 if n <= window else (n - window + stride - 1) // stride + 1
    out = []
    for i in range(nc):
        start = i * stride
        piece = words[start : start + window]
        if len(piece) >= min_words:
            out.append(
                (
                    doc_id,
                    i,
                    start,
                    len(piece),
                    _h60(f"{doc_id}:{i}"),
                    " ".join(piece),
                )
            )
    return out


# -------------------------------------------------------------- chunk_windows
class TestChunkWindows:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id bigint, text string")

    def test_matches_pure_python(self, spark):
        from flatbread_spark.operators.chunking import chunk_windows

        rows = [
            (i, " ".join(f"w{i}_{j}" for j in range((i * 13) % 40 + 1)))
            for i in range(30)
        ]
        got = {
            tuple(r)
            for r in chunk_windows(
                self._df(spark, rows), "doc_id", "text", 8, 5
            ).collect()
        }
        want = {
            t for (doc_id, text) in rows for t in _py_chunks(doc_id, text, 8, 5)
        }
        assert got == want

    def test_full_coverage_and_overlap(self, spark):
        from flatbread_spark.operators.chunking import chunk_windows

        text = " ".join(f"t{j}" for j in range(100))
        out = chunk_windows(
            self._df(spark, [(1, text)]), "doc_id", "text", 16, 12
        ).collect()
        covered = set()
        for r in out:
            covered.update(range(r["start_word"], r["start_word"] + r["n_chunk_words"]))
        assert covered == set(range(100))
        # consecutive windows overlap by window - stride
        starts = sorted(r["start_word"] for r in out)
        assert all(b - a == 12 for a, b in zip(starts, starts[1:]))

    def test_min_chunk_words_drops_runt(self, spark):
        from flatbread_spark.operators.chunking import chunk_windows

        text = " ".join(f"t{j}" for j in range(21))  # windows: 0-15, 12-20(9)
        df = self._df(spark, [(1, text)])
        assert chunk_windows(df, "doc_id", "text", 16, 12).count() == 2
        assert (
            chunk_windows(df, "doc_id", "text", 16, 12, min_chunk_words=10).count()
            == 1
        )

    def test_keep_text_false_drops_string(self, spark):
        from flatbread_spark.operators.chunking import chunk_windows

        out = chunk_windows(
            self._df(spark, [(1, "a b c")]), "doc_id", "text", 2, 1, keep_text=False
        )
        assert "chunk_text" not in out.columns

    def test_invalid_params_raise(self, spark):
        from flatbread_spark.operators.chunking import chunk_windows

        df = self._df(spark, [(1, "a b")])
        with pytest.raises(ValueError):
            chunk_windows(df, "doc_id", "text", 4, 5)
        with pytest.raises(ValueError):
            chunk_windows(df, "doc_id", "text", 0, 0)

    def test_zero_shuffle_plan(self, spark):
        from flatbread_spark.operators.chunking import chunk_windows

        df = self._df(spark, [(1, "a b c d e")])
        plan = chunk_windows(df, "doc_id", "text", 2, 1)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
