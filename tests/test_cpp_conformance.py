"""Conformance against the COMPILED C++ reference engine (VERDICT item 7).

Compiles ``/root/reference/KaggleFinanceSourceEngine.cpp`` with a minimal
driver (no boost — calls ``ParseSources`` + ``SearchEngine::HandleQuery``
directly, the same approach BASELINE.md used by hand), runs the reference's
own 6-document sample corpus through it, and checks our
``QueryEngine.reference_query`` returns the same ranked results.

The reference sorts with ``std::sort`` (``SearchEngine.h:347``), which
leaves docs with EQUAL 9-level comparator keys in unspecified relative
order; our engine breaks ties by ascending docID.  The comparison therefore
asserts (a) identical result SETS and (b) identical comparator-key
SEQUENCES — i.e. the two orderings agree everywhere the reference's
ordering is defined.

Skips gracefully when g++ is unavailable.
"""

import glob
import json
import shutil
import subprocess

import pytest

REF = "/root/reference"
SAMPLES = REF + "/sample_kaggle_finance_data"

pytestmark = pytest.mark.skipif(shutil.which("g++") is None,
                                reason="g++ not available")

DRIVER_CPP = r"""
#include <iostream>
#include <memory>
#include <string>
#include "KaggleFinanceSourceEngine.h"
#include "SearchEngine.h"

// The reference's parse pipeline is racy at ANY thread count: filler
// threads exit once `currently_parsing_` flips false and their alpha
// buffer is momentarily empty, while the arbitrator may still be draining
// its queue — whole (term -> doc) posting pairs are silently dropped
// (KaggleFinanceSourceEngine.cpp:284-324).  Drops only ever LOSE entries,
// so the parse with the MAXIMAL posting-pair count is the most complete
// one; parse several times and keep the best.
static size_t Digest(search_engine::KaggleFinanceEngine& eng) {
    size_t d = eng.GetRuntimeDatabase()->id_map.size() * 1000000007ULL;
    for (auto& m : eng.GetRuntimeDatabase()->value_index)
        for (auto& kv : m) d += kv.second.size();
    return d;
}

int main(int argc, char** argv) {
    std::string path = argv[1];
    std::unique_ptr<search_engine::KaggleFinanceEngine> best;
    size_t best_d = 0;
    for (int attempt = 0; attempt < 5; attempt++) {
        auto eng = std::make_unique<search_engine::KaggleFinanceEngine>(1, 1);
        eng->ParseSources(path);
        size_t d = Digest(*eng);
        if (!best || d > best_d) { best = std::move(eng); best_d = d; }
    }
    search_engine::SearchEngine<size_t, size_t, std::string> se(std::move(best));
    std::string line;
    while (std::getline(std::cin, line)) {
        // HandleQuery also prints skip diagnostics to stdout; result lines
        // are prefixed so the test can filter them out
        for (auto& p : se.HandleQuery(line)) std::cout << "R\t" << p << "\n";
        std::cout << "E" << std::endl;
    }
    return 0;
}
"""

# all 9 categories, quoted phrases, multi-group unions, skip paths
# (mismatched quote, short terms), and a no-hit probe
CONFORMANCE_QUERIES = [
    "values: german income",
    'people: "eaton vance"',
    "values: german income | title: funds euro",
    "values: market the bank",
    "langs: english | values: brexit",
    "orgs: reuters | countries: us",
    'people: "eric schweitzer"',
    "sites: www.reuters.com | values: bank",
    "locations: berlin | values: fund",
    "authors: reuters",
    'people: "eaton vance',       # mismatched quote: term-skip path
    "values: a an the income",    # short-term skip path
    "values: nosuchwordatall",
    'values: "german\\" income" market',   # escaped quote inside a phrase
    "values:\tgerman\tincome | title: funds",  # tabs: label fuses with term
    "values:german income",       # no space: label-term fusion
    'people: market\\" bank',     # trailing escaped quote on a bare token
]


@pytest.fixture(scope="module")
def ref_engine(tmp_path_factory):
    d = tmp_path_factory.mktemp("refcpp")
    cpp = d / "driver.cpp"
    cpp.write_text(DRIVER_CPP)
    exe = str(d / "refengine")
    r = subprocess.run(
        ["g++", "-O2", "-std=c++17", "-pthread", f"-I{REF}", str(cpp),
         f"{REF}/KaggleFinanceSourceEngine.cpp", "-o", exe],
        capture_output=True, text=True, timeout=600)
    if r.returncode != 0:
        pytest.skip(f"reference compile failed: {r.stderr[:800]}")
    return exe


def _run_reference(exe: str, queries: list[str]) -> list[list[str]]:
    """One process, all queries on stdin → per-query ranked file paths."""
    proc = subprocess.run([exe, SAMPLES], input="\n".join(queries) + "\n",
                          capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stderr[:800]
    out: list[list[str]] = [[]]
    for line in proc.stdout.splitlines():
        if line.startswith("R\t"):
            out[-1].append(line[2:])
        elif line == "E":
            out.append([])
    assert len(out) - 1 == len(queries), proc.stdout[:800]
    return out[:-1]


@pytest.fixture(scope="module")
def golden_engine(ray_session, tmp_path_factory):
    """Our index over the same 6 sample docs + path→docID mapping."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from search_engine_ray.pipelines.build import build_reference_index
    from search_engine_ray.pipelines.oracle import ReferenceOracle
    from search_engine_ray.pipelines.query import QueryEngine
    from search_engine_ray.sources.kaggle_json import (ARTICLES_SCHEMA,
                                                       read_kaggle_articles)
    from search_engine_ray.state.checkpoint import IndexConfig
    root = tmp_path_factory.mktemp("cppconf")
    rows = read_kaggle_articles(SAMPLES).take_all()
    src = str(root / "articles.parquet")
    pq.write_table(pa.Table.from_pylist(rows, schema=ARTICLES_SCHEMA), src)
    idx = str(root / "idx")
    build_reference_index(src, idx, IndexConfig(n_buckets=4, n_doc_shards=2))
    qe = QueryEngine(idx, num_searchers=2, use_actors=False)

    doc_of_uuid = {r["uuid"]: r["doc_id"] for r in rows}
    doc_of_path = {}
    for path in glob.glob(SAMPLES + "/**/*.json", recursive=True):
        with open(path, encoding="utf-8") as f:
            doc_of_path[path] = doc_of_uuid[json.load(f)["uuid"]]
    assert len(doc_of_path) == 6

    orc = ReferenceOracle()
    for r in rows:
        orc.add(r["doc_id"], text=r["text"], title=r["title"],
                site=r["site"], author=r["author"], country=r["country"],
                language=r["lang"], persons=r["persons"],
                locations=r["locations"], organizations=r["organizations"])
    return qe, doc_of_path, orc


def _compiled_probes(raw: str) -> list[tuple[str, str]]:
    """The (field, cleaned-term) probes reference_query compiles, for
    appraisal-key lookup."""
    from search_engine_ray.functions.analyze import (clean_metadata,
                                                     normalize_token)
    from search_engine_ray.functions.queryparse import (TEXT_CATEGORIES,
                                                        parse_query)
    probes = []
    for p in parse_query(raw, strict_compat=True):
        term = (normalize_token(p.term) if p.category in TEXT_CATEGORIES
                else clean_metadata(p.term))
        if term is not None:
            probes.append((p.field, term))
    return probes


_SKIP_PREFIXES = (
    ("size", "Invalid term size. The following term was skipped: "),
    ("quote", "Invalid quote matching. The following term was skipped: "),
)


def test_skip_decision_fuzz_matches_reference(ref_engine):
    """The reference prints every token it skips (with the reason) while
    scanning a query — fuzz random grammar-shaped strings and require our
    strict parser to make the IDENTICAL skip decisions in the identical
    order.  This pins the term regex, the length-before-strip quirk, and
    the escaped-quote logic far beyond the curated query list."""
    import random
    from search_engine_ray.functions.queryparse import strict_skipped_terms
    rng = random.Random(42)
    labels = ["values:", "title:", "people:", "sites:", "langs:", "bogus:"]
    pieces = [" ", " ", ",", "|", '"', '\\"', "ab", "a", "income", "german",
              '"eaton vance"', '"eaton', 'vance"', "\t", "x", "::",
              '"a"', "zz,", " a ", '"ab\\" cd"']
    queries = []
    for _ in range(80):
        q = rng.choice(labels) + "".join(
            rng.choice(pieces) for _ in range(rng.randint(2, 12)))
        if rng.random() < 0.4:
            q += " | " + rng.choice(labels) + " " + rng.choice(pieces)
        queries.append(q)

    proc = subprocess.run([ref_engine, SAMPLES],
                          input="\n".join(queries) + "\n",
                          capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stderr[:800]
    sections: list[list[tuple[str, str]]] = [[]]
    for line in proc.stdout.splitlines():
        if line == "E":
            sections.append([])
            continue
        for reason, prefix in _SKIP_PREFIXES:
            if line.startswith(prefix):
                sections[-1].append((reason, line[len(prefix):]))
    assert len(sections) - 1 == len(queries)

    n_with_skips = 0
    for q, want in zip(queries, sections):
        got = strict_skipped_terms(q)
        assert got == want, repr(q)
        n_with_skips += bool(want)
    assert n_with_skips >= 10   # the fuzz actually exercised the paths


def test_ranked_results_match_compiled_reference(ref_engine, golden_engine,
                                                 ray_session):
    qe, doc_of_path, orc = golden_engine
    per_query = _run_reference(ref_engine, CONFORMANCE_QUERIES)
    n_nonempty = 0
    for raw, cpp_paths in zip(CONFORMANCE_QUERIES, per_query):
        cpp_docs = [doc_of_path[p] for p in cpp_paths][:10]
        got = qe.reference_query(raw, k=10, strict_compat=True)
        assert set(got) == set(cpp_docs), raw
        keys = orc.appraise(_compiled_probes(raw))
        assert [keys[d] for d in got] == [keys[d] for d in cpp_docs], raw
        n_nonempty += bool(cpp_docs)
    # the corpus must actually exercise the comparison
    assert n_nonempty >= 6
