"""Reader for the reference engine's native input: one Kaggle
"US financial news articles" JSON document per file, discovered by recursive
directory walk (``/root/reference/KaggleFinanceSourceEngine.cpp:33-38``),
fields per ``.cpp:213-254``.

Ray Data restatement: ``read_binary_files(file_extensions=["json"])`` (the
distributed analogue of the reference's per-thread POSIX file reads, S2) →
``map_batches`` JSON parse (the rapidjson DOM stage, S3) → one articles-shaped
row per file, directly consumable by ``FieldedPostings`` /
``build_reference_index``.
"""

from __future__ import annotations

import json

import pyarrow as pa

from ..functions.hashing import doc_ids_from_urls

ARTICLES_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("uuid", pa.string()),
    ("path", pa.string()),
    ("text", pa.string()),
    ("title", pa.string()),
    ("site", pa.string()),
    ("author", pa.string()),
    ("country", pa.string()),
    ("lang", pa.string()),
    ("persons", pa.list_(pa.string())),
    ("locations", pa.list_(pa.string())),
    ("organizations", pa.list_(pa.string())),
])


def parse_article_batch(batch: pa.Table) -> pa.Table:
    """``(bytes, path)`` rows from ``read_binary_files`` → articles rows.

    Field extraction mirrors the reference exactly
    (``KaggleFinanceSourceEngine.cpp:213-254``): uuid, text, thread.title,
    thread.site, author, thread.country, language, entity name lists.
    Non-object documents are skipped (the reference logs and skips,
    ``.cpp:207-210``).
    """
    rows = []
    paths = (batch["path"].to_pylist() if "path" in batch.column_names
             else [""] * batch.num_rows)
    for raw, path in zip(batch["bytes"].to_pylist(), paths):
        try:
            doc = json.loads(raw)
        except (json.JSONDecodeError, UnicodeDecodeError):
            continue
        if not isinstance(doc, dict):
            continue
        thread = doc.get("thread") or {}
        ents = doc.get("entities") or {}

        def names(kind: str) -> list[str]:
            return [e.get("name", "") for e in (ents.get(kind) or [])
                    if isinstance(e, dict)]

        uuid = str(doc.get("uuid", ""))
        rows.append({
            "uuid": uuid,
            "path": path,
            "text": str(doc.get("text", "")),
            "title": str(thread.get("title", "")),
            "site": str(thread.get("site", "")),
            "author": str(doc.get("author", "")),
            "country": str(thread.get("country", "")),
            "lang": str(doc.get("language", "")),
            "persons": names("persons"),
            "locations": names("locations"),
            "organizations": names("organizations"),
        })
    ids = doc_ids_from_urls(pa.array([r["uuid"] for r in rows],
                                     type=pa.string()))
    cols = {"doc_id": pa.array(ids, type=pa.int64())}
    for field in ARTICLES_SCHEMA:
        if field.name == "doc_id":
            continue
        cols[field.name] = pa.array([r[field.name] for r in rows],
                                    type=field.type)
    return pa.table(cols, schema=ARTICLES_SCHEMA)


def read_kaggle_articles(path: str) -> "ray.data.Dataset":
    """Directory of ``*.json`` article files → articles Dataset."""
    import ray.data
    ds = ray.data.read_binary_files(path, file_extensions=["json"],
                                    include_paths=True)
    return ds.map_batches(parse_article_batch, batch_format="pyarrow")
