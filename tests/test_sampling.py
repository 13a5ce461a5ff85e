"""Training-mix operators (operators/sampling.py): deterministic stratified
sampling and concat-and-chunk sequence packing."""

from __future__ import annotations

from pyspark.sql import functions as F

from webcrawler_woc_spark.operators.sampling import pack_sequences, stratified_sample


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


class TestStratifiedSample:
    def test_deterministic_and_subset(self, spark, sf_dir):
        docs = _docs(spark, sf_dir)
        a = {r["doc_id"] for r in stratified_sample(docs, "lang", {"en": 50}).select("doc_id").collect()}
        b = {r["doc_id"] for r in stratified_sample(docs, "lang", {"en": 50}).select("doc_id").collect()}
        assert a == b  # no RNG state: identical across runs
        assert a <= {r["doc_id"] for r in docs.select("doc_id").collect()}

    def test_default_rate_keeps_everything(self, spark, sf_dir):
        docs = _docs(spark, sf_dir)
        assert stratified_sample(docs, "lang", {}).count() == docs.count()

    def test_rate_zero_drops_stratum_entirely(self, spark, sf_dir):
        docs = _docs(spark, sf_dir)
        kept = stratified_sample(docs, "lang", {"en": 0})
        assert kept.filter(F.col("lang") == "en").count() == 0
        # other strata untouched
        assert (
            kept.filter(F.col("lang") != "en").count()
            == docs.filter(F.col("lang") != "en").count()
        )

    def test_rate_roughly_honored(self, spark, sf_dir):
        docs = _docs(spark, sf_dir)
        n_en = docs.filter(F.col("lang") == "en").count()
        if n_en < 50:
            return  # not enough rows to be statistical
        kept = stratified_sample(docs, "lang", {"en": 50}).filter(F.col("lang") == "en").count()
        assert 0.3 * n_en <= kept <= 0.7 * n_en


class TestPackSequences:
    def test_offsets_within_budget_and_bins_monotone(self, spark, sf_dir):
        rows = (
            pack_sequences(_docs(spark, sf_dir), budget_tokens=512)
            .orderBy("doc_id")
            .collect()
        )
        assert all(0 <= r["offset_in_bin"] < 512 for r in rows)
        bins = [r["bin_id"] for r in rows]
        assert bins == sorted(bins)  # stream layout: bins never go backwards
        # exact stream arithmetic: bin*budget + offset == tokens before doc
        cum = 0
        for r in rows:
            assert r["bin_id"] * 512 + r["offset_in_bin"] == cum
            cum += r["n_tokens"]

    def test_sharded_packing_is_independent_per_shard(self, spark):
        """shard_col partitions the running sum: each shard packs as if the
        others did not exist (bin_id restarts, offsets restart), which is the
        scale form — no global single-task window."""
        rows = [
            (1, "aa bb cc", "en"),   # 3 tokens
            (2, "dd ee", "en"),      # 2 tokens -> en stream: 3,2
            (10, "x y z w", "de"),   # 4 tokens
            (11, "v", "de"),         # 1 token  -> de stream: 4,1
        ]
        df = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
        out = {
            (r.lang, r.doc_id): (r.bin_id, r.offset_in_bin)
            for r in pack_sequences(df, budget_tokens=4, shard_col="lang").collect()
        }
        assert out == {
            ("en", 1): (0, 0),   # starts the en stream
            ("en", 2): (0, 3),   # 3 tokens before it, same bin
            ("de", 10): (0, 0),  # de stream restarts at 0 regardless of en
            ("de", 11): (1, 0),  # 4 tokens before it = exactly one full bin
        }
        # the global form over the SAME data is a different layout (one stream)
        g = {
            r.doc_id: (r.bin_id, r.offset_in_bin)
            for r in pack_sequences(df, budget_tokens=4).collect()
        }
        assert g[10] != out[("de", 10)] or g[11] != out[("de", 11)]

    def test_total_bins_matches_token_stream(self, spark, sf_dir):
        docs = _docs(spark, sf_dir)
        out = pack_sequences(docs, budget_tokens=512)
        total_tokens = out.agg(F.sum("n_tokens")).collect()[0][0]
        last = out.orderBy(F.desc("doc_id")).limit(1).collect()[0]
        assert last["bin_id"] <= total_tokens // 512


class TestExactPercentiles:
    def test_rank_selection(self, spark):
        from pyspark.sql import functions as F

        from webcrawler_woc_spark.operators.sampling import exact_percentiles

        rows = [("a", v, i) for i, v in enumerate([10, 20, 30, 40, 50, 60, 70, 80, 90, 100])]
        rows += [("b", 7, 99)]
        df = spark.createDataFrame(rows, "g string, v bigint, k bigint")
        out = {r.g: r for r in exact_percentiles(
            df, "g", F.col("v"), quantiles=[50, 90, 99], tiebreak="k").collect()}
        # n=10: p50 -> rank (9*50)//100+1 = 5 -> 50; p90 -> rank 9 -> 90; p99 -> rank 9 -> 90
        assert (out["a"].n, out["a"].p50, out["a"].p90, out["a"].p99) == (10, 50, 90, 90)
        assert (out["b"].n, out["b"].p50, out["b"].p99) == (1, 7, 7)
