"""URL parse stage: crafted-URL semantics + DuckDB RE2 parity + host stats."""

import duckdb
import pyarrow as pa

from search_engine_ray.stages.webtext import URL_RE, UrlParse

CRAFTED = [
    "https://site001.example/p/0000001",
    "http://WWW.Example.COM./a/b/c?q=1#frag",
    "https://example.org",                      # no path
    "https://example.org/",                     # root path
    "ftp://files.archive.net:2121/pub//x.gz",   # port + empty segment
    "https://a.b.c.d.co.uk/deep/1/2/3/4/5",
    "not a url at all",
    "//missing-scheme.example/x",
    "https://host/path?only=query",
    "HTTPS://UPPER.CASE/PATH",
]


def _parse(urls):
    return UrlParse()(pa.table({"url": pa.array(urls, pa.string())}))


class TestUrlParse:
    def test_crafted_semantics(self):
        out = _parse(CRAFTED)
        host = out["host"].to_pylist()
        assert host[0] == "site001.example"
        assert host[1] == "www.example.com"      # lowered, trailing dot gone
        assert host[6] is None and host[7] is None
        assert out["scheme"].to_pylist()[9] == "https"
        assert out["path"].to_pylist()[2] == "/"   # missing path normalized
        assert out["path"].to_pylist()[8] == "/path"  # query dropped
        assert out["path_depth"].to_pylist() == \
            [2, 3, 0, 0, 2, 6, None, None, 1, 1]
        assert out["tld"].to_pylist()[1] == "com"
        assert out["domain"].to_pylist()[5] == "co.uk"
        assert out["domain"].to_pylist()[0] == "site001.example"

    def test_duckdb_re2_parity(self):
        # both engines are RE2: the raw group extraction must agree row-wise
        con = duckdb.connect()
        con.register("u", pa.table({"url": pa.array(CRAFTED)}))
        rows = con.execute(
            f"SELECT regexp_extract(url, '{URL_RE}', ['scheme','host','port','path'])"
            " FROM u").fetchall()
        out = _parse(CRAFTED)
        for i, (m,) in enumerate(rows):
            if m["host"] == "":
                assert out["host"][i].as_py() is None
            else:
                assert out["host"][i].as_py() == m["host"].lower().rstrip(".")
                want_path = m["path"] or "/"
                assert out["path"][i].as_py() == want_path

    def test_host_stats_pipeline(self, ray_session):
        from search_engine_ray.pipelines.queries import q_url_host_stats
        df = q_url_host_stats(n_pages=300).to_pandas()
        assert df["n_pages"].sum() == 300
        assert (df["last_fetch_us"] >= df["first_fetch_us"]).all()
        assert df["host"].str.match(r"site\d{3}\.example").all()
        # zipf site popularity: site000 must dominate
        assert df.sort_values("n_pages").iloc[-1]["host"] == "site000.example"


class TestBoilerplateRemoval:
    def test_matches_bruteforce(self, ray_session):
        import collections
        import numpy as np
        from search_engine_ray.pipelines.queries import (BOILERPLATE_MIN_DF,
                                                         q_boilerplate_removal)
        from search_engine_ray.sources.pages import pages_batch
        from search_engine_ray.stages.extract import extract_full_text_array
        n = 300
        got = (q_boilerplate_removal(n_pages=n).to_pandas()
               .sort_values("url").reset_index(drop=True))
        t = pages_batch(np.arange(n))
        texts = extract_full_text_array(t["html"]).to_pylist()
        df = collections.Counter()
        for x in texts:
            df.update({p for p in x.split("\n\n") if p})
        boiler = {p for p, c in df.items() if c >= BOILERPLATE_MIN_DF}
        # nav fragments and the dominant site's footer must be boilerplate
        assert {"home", "about", "contact", "terms", "|"} <= boiler
        assert any(p.startswith("© 2018 site000.example") for p in boiler)
        urls = t["url"].to_pylist()
        for i, u in enumerate(sorted(range(n), key=lambda i: urls[i])):
            paras = [p for p in texts[u].split("\n\n") if p]
            kept = [p for p in paras if p not in boiler]
            row = got.iloc[i]
            assert row["url"] == urls[u]
            assert row["n_paras"] == len(paras)
            assert row["n_dropped"] == len(paras) - len(kept)
            assert row["clean_len"] == len("\n\n".join(kept))

    def test_body_survives(self, ray_session):
        # ground-truth article text is unique per page: nothing from the
        # article body may be dropped, only nav/footer/title collisions
        from search_engine_ray.pipelines.queries import q_boilerplate_removal
        df = q_boilerplate_removal(n_pages=300).to_pandas()
        # every page keeps a substantial body
        assert (df["clean_len"] > 100).all()
        assert (df["n_dropped"] >= 5).all()   # home/|/|/about/contact/terms…


class TestExtractLinks:
    def _batch(self, urls, htmls):
        import pyarrow as pa
        return pa.table({"url": pa.array(urls),
                         "html": pa.array([h.encode() for h in htmls],
                                          type=pa.binary())})

    def test_absolute_relative_self_and_malformed(self):
        from search_engine_ray.stages.webtext import ExtractLinks
        b = self._batch(
            ["https://a.example/p/1", "https://b.example/x"],
            ['<a href="https://b.example/z">t</a>'
             '<a href="/rel">r</a>'                      # relative → self
             '<a href="https://A.EXAMPLE/self">s</a>'    # self, case-folded
             '<a href="HTTPS://c.example:8080/q?x=1">c</a>'
             '<a href="mailto:x@y">m</a>'                # non-http scheme
             '<a href=broken>n</a>',                     # unquoted
             'no links at all'])
        out = ExtractLinks()(b)
        pairs = list(zip(out["src_host"].to_pylist(),
                         out["dst_host"].to_pylist()))
        assert pairs == [("a.example", "b.example"),
                         ("a.example", "c.example")]

    def test_keep_self_loops_when_asked(self):
        from search_engine_ray.stages.webtext import ExtractLinks
        b = self._batch(["https://a.example/"],
                        ['<a href="https://a.example/two">x</a>'])
        out = ExtractLinks(drop_self=False)(b)
        assert out["dst_host"].to_pylist() == ["a.example"]

    def test_multi_edges_preserved_and_batching_stable(self):
        import pyarrow as pa
        from search_engine_ray.stages.webtext import ExtractLinks
        html = ('<a href="https://b.example/1">x</a>'
                '<a href="https://b.example/2">y</a>')
        b = self._batch(["https://a.example/", "https://c.example/"],
                        [html, html])
        whole = ExtractLinks()(b)
        split = pa.concat_tables([ExtractLinks()(b.slice(0, 1)),
                                  ExtractLinks()(b.slice(1, 1))])
        assert whole.equals(split)
        assert whole.num_rows == 4

    def test_corpus_links_are_deterministic(self, ray_session):
        from search_engine_ray.sources.pages import pages_batch
        from search_engine_ray.stages.webtext import ExtractLinks
        import numpy as np
        t = pages_batch(np.arange(50))
        out1 = ExtractLinks()(t.select(["url", "html"]))
        out2 = ExtractLinks()(pages_batch(np.arange(50)).select(["url", "html"]))
        assert out1.equals(out2)
        assert out1.num_rows >= 25            # 1-3 outlinks/page minus selfs
        assert all(h.startswith("site") for h in out1["dst_host"].to_pylist())
