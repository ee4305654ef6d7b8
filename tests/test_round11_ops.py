"""Round-11 operators: curriculum training order, cross-source duplication
matrix. Checked against independent pure-Python re-derivations plus the
documented determinism guarantees."""
import hashlib

from pyspark.sql import functions as F


# ----------------------------------------------------------- curriculum_order
class TestCurriculumOrder:
    def _df(self, spark):
        rows = [(i, 1000 - i * 37 % 900) for i in range(60)]
        return spark.createDataFrame(rows, "doc_id bigint, q bigint")

    def _tier(self):
        return (
            F.when(F.col("q") >= 700, 0).when(F.col("q") >= 300, 1).otherwise(2)
        )

    def test_matches_reference_order(self, spark):
        from flatbread_spark.operators.ranking import curriculum_order

        df = self._df(spark)
        got = {
            r["doc_id"]: (r["tier"], r["train_pos"])
            for r in curriculum_order(df, "doc_id", self._tier(), salt=":s").collect()
        }

        def tier(q):
            return 0 if q >= 700 else (1 if q >= 300 else 2)

        rows = [(i, 1000 - i * 37 % 900) for i in range(60)]
        expect = sorted(
            rows,
            key=lambda r: (
                tier(r[1]),
                hashlib.md5(f"{r[0]}:s".encode()).hexdigest(),
                r[0],
            ),
        )
        for pos, (doc_id, q) in enumerate(expect, start=1):
            assert got[doc_id] == (tier(q), pos)

    def test_positions_dense_and_tiers_contiguous(self, spark):
        from flatbread_spark.operators.ranking import curriculum_order

        out = curriculum_order(
            self._df(spark), "doc_id", self._tier()
        ).orderBy("train_pos").collect()
        assert [r["train_pos"] for r in out] == list(range(1, 61))
        tiers = [r["tier"] for r in out]
        assert tiers == sorted(tiers)  # tier 0 block first, then 1, then 2

    def test_salt_rerolls_within_tier_only(self, spark):
        from flatbread_spark.operators.ranking import curriculum_order

        df = self._df(spark)
        a = curriculum_order(df, "doc_id", self._tier(), salt="a").collect()
        b = curriculum_order(df, "doc_id", self._tier(), salt="b").collect()
        ta = {r["doc_id"]: r["tier"] for r in a}
        tb = {r["doc_id"]: r["tier"] for r in b}
        assert ta == tb  # tiers stable
        pa = {r["doc_id"]: r["train_pos"] for r in a}
        pb = {r["doc_id"]: r["train_pos"] for r in b}
        assert pa != pb  # order re-rolled


# ---------------------------------------------------------- dup_source_matrix
class TestDupSourceMatrix:
    def test_pair_counts(self, spark):
        from flatbread_spark.operators.dedup import dup_source_matrix

        rows = [
            # content X: 2 in s1, 1 in s2 -> diag s1=1 pair, (s1,s2)=2 pairs
            (1, "s1", "X"), (2, "s1", "X"), (3, "s2", "X"),
            # content Y: 3 in s2 -> diag s2 = 3 pairs
            (4, "s2", "Y"), (5, "s2", "Y"), (6, "s2", "Y"),
            # content Z unique -> contributes nothing
            (7, "s1", "Z"),
        ]
        df = spark.createDataFrame(rows, "id bigint, src string, c string")
        got = {
            (r["src_a"], r["src_b"]): (r["n_fingerprints"], r["n_pairs"])
            for r in dup_source_matrix(df, "id", "c", "src").collect()
        }
        assert got == {
            ("s1", "s1"): (1, 1),
            ("s1", "s2"): (1, 2),
            ("s2", "s2"): (1, 3),
        }

    def test_total_pairs_identity(self, spark):
        """Σ over the matrix equals Σ over fingerprints of C(n,2) — the
        matrix is a partition of all duplicate pairs."""
        from flatbread_spark.operators.dedup import dup_source_matrix

        rows = [
            (i, f"s{i % 3}", f"c{(i * 7) % 11}") for i in range(120)
        ]
        df = spark.createDataFrame(rows, "id bigint, src string, c string")
        matrix_total = (
            dup_source_matrix(df, "id", "c", "src")
            .agg(F.sum("n_pairs"))
            .first()[0]
        )
        per_fp = (
            df.groupBy("c").count().filter("count >= 2")
            .select(F.expr("(count * (count - 1)) div 2").alias("p"))
            .agg(F.sum("p")).first()[0]
        )
        assert matrix_total == per_fp


# --------------------------------------------------------- stream_rate_anomaly
class TestStreamRateAnomaly:
    def test_drained_stream_equals_batch(self, spark, events, tmp_path):
        """The streaming monitor's drained replay must equal the batch
        rate_anomaly filtered to closed, fully-historied buckets."""
        import os

        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from flatbread_spark.functions.eventtime import ensure_epoch_ns
        from flatbread_spark.operators.timeseries import rate_anomaly
        from flatbread_spark.streaming.rate import stream_rate_anomaly
        from tests.conftest import SF_DIR

        DAY = 86_400_000_000_000
        ev = ensure_epoch_ns(events, "ts")
        batch = rate_anomaly(
            ev, ["user_id"], "ts", DAY, trailing=3, factor_x1000=3000,
            min_count=4,
        )
        mx = Window.partitionBy("user_id")
        expect = {
            (r["user_id"], r["bucket_start"]): (
                r["n"], r["trailing_sum"], r["ratio_x1000"], r["is_anomaly"]
            )
            for r in batch.withColumn(
                "__mx", F.max("bucket_start").over(mx)
            )
            .filter(
                F.col("trailing_sum").isNotNull()
                & (F.col("bucket_start") < F.col("__mx"))
            )
            .collect()
        }

        stream_dir = tmp_path / "events_rate"
        stream_dir.mkdir()
        os.symlink(
            os.path.join(SF_DIR, "events.parquet"),
            stream_dir / "events.parquet",
        )
        raw_schema = spark.read.parquet(
            os.path.join(SF_DIR, "events.parquet")
        ).schema
        raw = spark.readStream.schema(raw_schema).parquet(str(stream_dir))
        sdf = stream_rate_anomaly(
            ensure_epoch_ns(raw, "ts"), "user_id", "ts", DAY,
            trailing=3, factor_x1000=3000, min_count=4,
        )
        assert sdf.isStreaming
        q = (
            sdf.writeStream.format("memory")
            .queryName("rate_test")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = {
            (int(r.k), int(r.bucket_start)): (
                int(r.n),
                int(r.trailing_sum),
                None if r.ratio_x1000 is None or r.ratio_x1000 != r.ratio_x1000
                else int(r.ratio_x1000),
                bool(r.is_anomaly),
            )
            for r in spark.sql("SELECT * FROM rate_test").toPandas().itertuples()
        }
        assert got == expect
        assert any(v[3] for v in got.values())  # at least one real anomaly

    def test_late_rows_never_rewrite_verdicts(self, spark, tmp_path):
        """A second batch carrying an already-closed bucket is absorbed
        into n_late state, not re-emitted."""
        import json
        import os

        from flatbread_spark.streaming.rate import stream_rate_anomaly

        import time

        d = tmp_path / "late_src"
        d.mkdir()
        # batch 1: buckets 0..4 for key 1 (bucket width 10)
        rows1 = [{"k": 1, "ts": b * 10 + i} for b in range(5) for i in range(2)]
        # batch 2: a late row for bucket 0 plus a new bucket 5
        rows2 = [{"k": 1, "ts": 1}, {"k": 1, "ts": 55}]
        with open(d / "b1.json", "w") as f:
            f.write("\n".join(json.dumps(r) for r in rows1))
        time.sleep(1.1)  # file-source orders batches by mod time
        with open(d / "b2.json", "w") as f:
            f.write("\n".join(json.dumps(r) for r in rows2))
        raw = (
            spark.readStream.schema("k long, ts long")
            .option("maxFilesPerTrigger", 1)
            .json(str(d))
        )
        sdf = stream_rate_anomaly(raw, "k", "ts", 10, trailing=3,
                                  factor_x1000=2000, min_count=4)
        q = (
            sdf.writeStream.format("memory").queryName("late_test")
            .outputMode("append")
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        rows = spark.sql(
            "SELECT bucket_start, n FROM late_test ORDER BY bucket_start"
        ).collect()
        # batch1 closes bucket 3 (hist 0,1,2 full), bucket 4 stays open;
        # batch2 closes bucket 4 with its ORIGINAL count (2) — the late
        # bucket-0 row was absorbed into n_late, not into any verdict
        buckets = [(r[0], r[1]) for r in rows]
        assert buckets == [(30, 2), (40, 2)]


# --------------------------------------------------------------- minhash_probe
class TestMinhashProbe:
    def _corpus_and_batch(self, spark):
        words = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
        corpus, batch = [], []
        for i in range(20):
            text = " ".join(words[j % 10] + str((i * 7 + j) % 13) for j in range(30))
            corpus.append((i * 2, text))
        # batch docs 1, 3: near-dups of corpus docs 0 and 2 (one word changed)
        batch.append((1, corpus[0][1].replace("alpha0", "alphaX", 1)))
        batch.append((3, corpus[1][1].replace("beta", "betaX", 1)))
        # batch docs 5, 7: near-dups OF EACH OTHER but of nothing in corpus
        novel = " ".join(f"nov{j}" for j in range(30))
        batch.append((5, novel))
        batch.append((7, novel.replace("nov3", "novX", 1)))
        return (
            spark.createDataFrame(corpus, "doc_id bigint, text string"),
            spark.createDataFrame(batch, "doc_id bigint, text string"),
        )

    def test_finds_corpus_dups_never_batch_pairs(self, spark):
        from flatbread_spark.operators.dedup import minhash_probe

        corpus, batch = self._corpus_and_batch(spark)
        out = minhash_probe(
            batch, corpus, "doc_id", "text", n=3, num_hashes=32, bands=16,
            threshold=0.5,
        ).collect()
        got = {(r["id_a"], r["id_b"]) for r in out}
        assert (1, 0) in got and (3, 2) in got
        # 5-7 are near-dups of each other but batch×batch is out of scope
        assert not any(a in (5, 7) or b in (5, 7) for a, b in got)
        assert all(r["jaccard"] >= 0.5 for r in out)

    def test_matches_bruteforce_jaccard(self, spark):
        """Every emitted pair's jaccard equals the exact set Jaccard of the
        two docs' shingle sets (python re-derivation)."""
        from flatbread_spark.operators.dedup import minhash_probe

        corpus, batch = self._corpus_and_batch(spark)
        out = minhash_probe(
            batch, corpus, "doc_id", "text", n=3, num_hashes=32, bands=16,
            threshold=0.3,
        ).collect()
        ctexts = {r["doc_id"]: r["text"] for r in corpus.collect()}
        btexts = {r["doc_id"]: r["text"] for r in batch.collect()}

        def shingles(t, n=3):
            w = t.split()
            if len(w) <= n:
                return {" ".join(w)}
            return {" ".join(w[i:i + n]) for i in range(len(w) - n + 1)}

        for r in out:
            a, b = shingles(btexts[r["id_a"]]), shingles(ctexts[r["id_b"]])
            true_j = round(len(a & b) / len(a | b), 6)
            assert abs(r["jaccard"] - true_j) < 1e-9

    def test_star_cap_links_batch_to_bucket_min(self, spark):
        from flatbread_spark.operators.dedup import minhash_probe

        text = " ".join(f"w{j}" for j in range(20))
        corpus = spark.createDataFrame(
            [(i, text) for i in range(10, 20)], "doc_id bigint, text string"
        )
        batch = spark.createDataFrame(
            [(1, text)], "doc_id bigint, text string"
        )
        out = minhash_probe(
            batch, corpus, "doc_id", "text", n=3, num_hashes=16, bands=4,
            threshold=0.5, max_band_bucket=3,
        ).collect()
        # every corpus bucket is over-cap -> the batch doc links to the
        # bucket min (id 10) via the star edge, jaccard 1.0
        assert {(r["id_a"], r["id_b"]) for r in out} == {(1, 10)}
        assert out[0]["jaccard"] == 1.0


# ----------------------------------------------------------- quantile_bucketize
class TestQuantileBucketize:
    def test_exact_equi_depth(self, spark):
        from flatbread_spark.operators.ranking import quantile_bucketize

        df = spark.createDataFrame(
            [(i, (i * 37) % 101) for i in range(103)], "id bigint, v bigint"
        )
        out = quantile_bucketize(df, "v", "id", 10).collect()
        sizes = {}
        for r in out:
            sizes[r["bucket"]] = sizes.get(r["bucket"], 0) + 1
        assert set(sizes) == set(range(1, 11))
        assert max(sizes.values()) - min(sizes.values()) <= 1  # equi-depth ±1
        # order-respecting: every bucket-b value <= every bucket-(b+1) value
        by_bucket = {}
        for r in out:
            by_bucket.setdefault(r["bucket"], []).append(r["v"])
        for b in range(1, 10):
            assert max(by_bucket[b]) <= min(by_bucket[b + 1])

    def test_matches_formula(self, spark):
        from flatbread_spark.operators.ranking import quantile_bucketize

        rows = [(i, (i * 7) % 13) for i in range(40)]
        df = spark.createDataFrame(rows, "id bigint, v bigint")
        got = {
            r["id"]: r["bucket"]
            for r in quantile_bucketize(df, "v", "id", 4).collect()
        }
        order = sorted(rows, key=lambda r: (r[1], r[0]))
        for pos, (i, v) in enumerate(order, start=1):
            assert got[i] == (pos - 1) * 4 // 40 + 1

    def test_k_validation(self, spark):
        import pytest

        from flatbread_spark.operators.ranking import quantile_bucketize

        df = spark.createDataFrame([(1, 1)], "id bigint, v bigint")
        with pytest.raises(ValueError):
            quantile_bucketize(df, "v", "id", 0)
