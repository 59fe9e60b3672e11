"""PII scrub, repetition stats, hash sampling — unit + oracle parity."""

import duckdb
import numpy as np
import pyarrow as pa

from search_engine_ray.stages.textstats import (PII_PATTERNS, PIIScrub,
                                                RepetitionStats)

SF = "/root/testdata/sf0.001"


def _batch(texts):
    return pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                     "text": pa.array(texts, pa.string())})


class TestPIIScrub:
    def test_patterns_redact(self):
        out = PIIScrub()(_batch([
            "mail me at bob.smith+x@exa-mple.org today",
            "server 10.0.255.3 port open",
            "acct 1234567890 expires",
            "the key is under the hash mat",
            "clean text only",
        ]))
        clean = out["clean_text"].to_pylist()
        assert clean[0] == "mail me at <EMAIL> today"
        assert clean[1] == "server <IP> port open"
        assert clean[2] == "acct <NUM> expires"
        assert clean[3] == "the <TERM> is under the <TERM> mat"
        assert clean[4] == "clean text only"
        assert out["n_email"].to_pylist() == [1, 0, 0, 0, 0]
        assert out["n_ip"].to_pylist() == [0, 1, 0, 0, 0]
        assert out["n_longnum"].to_pylist() == [0, 0, 1, 0, 0]
        assert out["n_blockterm"].to_pylist() == [0, 0, 0, 2, 0]

    def test_counts_taken_before_redaction(self):
        # the IP inside the email would be consumed by the email redaction;
        # counts are on the ORIGINAL text so both still count 1
        out = PIIScrub()(_batch(["x@1.2.3.4.com ."]))
        assert out["n_email"].to_pylist() == [1]
        assert out["n_ip"].to_pylist() == [1]

    def test_duckdb_regex_parity_on_crafted_rows(self):
        # RE2 on both sides: every pattern must count identically in DuckDB
        rows = ["a b@c.de f", "1.2.3.4 99999 999999", "key hash secret keys",
                "", "x" * 500]
        t = _batch(rows)
        got = PIIScrub()(t)
        con = duckdb.connect()
        con.register("documents", t)
        for name, pat, _ in PII_PATTERNS:
            want = con.execute(
                f"SELECT len(regexp_extract_all(text, '{pat}')) "
                f"FROM documents ORDER BY doc_id").fetchall()
            assert got[name].to_pylist() == [w[0] for w in want], name


class TestRepetitionStats:
    def test_matches_bruteforce(self):
        rng = np.random.RandomState(7)
        vocab = ["aa", "bb", "cc", "dd", "ee"]
        texts = [" ".join(rng.choice(vocab, size=rng.randint(0, 40)))
                 for _ in range(50)] + ["", "   ", "solo"]
        out = RepetitionStats()(_batch(texts))
        for i, text in enumerate(texts):
            toks = text.split()
            n, u = len(toks), len(set(toks))
            top = max([toks.count(w) for w in set(toks)], default=0)
            assert out["n_tokens"][i].as_py() == n
            assert out["n_unique"][i].as_py() == u
            if n:
                assert abs(out["dup_frac"][i].as_py()
                           - round((n - u) / n, 6)) < 1e-12
                assert abs(out["top_frac"][i].as_py()
                           - round(top / n, 6)) < 1e-12
            else:
                assert out["dup_frac"][i].as_py() == 0.0

    def test_batching_invariance(self, ray_session):
        # same rows through different batch sizes → identical stats
        from search_engine_ray.pipelines.queries import q_repetition_stats
        a = q_repetition_stats(SF).to_pandas().sort_values("doc_id")
        b = (q_repetition_stats(SF)
             .map_batches(lambda t: t, batch_size=7, batch_format="pyarrow")
             .to_pandas().sort_values("doc_id"))
        assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


class TestDocSampleHash:
    def test_deterministic_and_near_rate(self, ray_session):
        from search_engine_ray.pipelines.queries import (SAMPLE_PCT,
                                                         q_doc_sample_hash)
        a = sorted(q_doc_sample_hash(SF).to_pandas()["doc_id"])
        b = sorted(q_doc_sample_hash(SF).to_pandas()["doc_id"])
        assert a == b
        assert 0.5 * SAMPLE_PCT / 100 < len(a) / 500 < 1.5 * SAMPLE_PCT / 100


class TestStratifiedSample:
    def test_per_stratum_rates(self, ray_session):
        from search_engine_ray.pipelines.queries import (STRATA_PCT,
                                                         q_stratified_sample)
        df = q_stratified_sample(SF).to_pandas()
        full = duckdb.sql(
            f"SELECT lang, count(*) c FROM read_parquet('{SF}/documents.parquet')"
            " GROUP BY lang").df().set_index("lang")["c"]
        kept = df.groupby("lang").size()
        for lang, pct in STRATA_PCT.items():
            if lang in full.index and full[lang] >= 20:
                rate = kept.get(lang, 0) / full[lang]
                assert 0.4 * pct / 100 < rate < 2.0 * pct / 100, (lang, rate)
        # subset-of-corpus + determinism
        again = q_stratified_sample(SF).to_pandas()
        assert sorted(df["doc_id"]) == sorted(again["doc_id"])


class TestDedupIncremental:
    def test_matches_bruteforce(self, ray_session):
        import pyarrow.parquet as pq
        from search_engine_ray.pipelines.queries import q_dedup_incremental
        t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
        ids = t["doc_id"].to_pylist()
        texts = t["text"].to_pylist()
        corpus = {x for i, x in zip(ids, texts) if i % 2 == 0}
        want = {}
        for i, x in zip(ids, texts):
            if i % 2 == 1 and x not in corpus:
                k, n = want.get(x, (1 << 62, 0))
                want[x] = (min(k, i), n + 1)
        got = q_dedup_incremental(SF).to_pandas()
        assert sorted(zip(got["doc_id"], got["n_batch_copies"])) == \
            sorted(want.values())
