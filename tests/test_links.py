"""Key normalization (M1/M2 analog) and code link extraction (M4 analog)."""

import pyarrow as pa

from seekr_ray.stages.links import (
    extract_links,
    normalize_path,
    normalize_repo,
)


def test_normalize_repo():
    assert normalize_repo("Org1/Repo2") == "org1/repo2"
    assert normalize_repo("/org/repo/") == "org/repo"
    assert normalize_repo("") is None
    assert normalize_repo(None) is None


def test_normalize_path():
    assert normalize_path("./src//core/a.py") == "src/core/a.py"
    assert normalize_path("/src/a.py/") == "src/a.py"
    assert normalize_path("") is None
    assert normalize_path("///") is None


def _docs(rows):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "repo": pa.array([r[0] for r in rows]),
                "path": pa.array([r[1] for r in rows]),
                "commit": pa.array(["c" * 8] * len(rows)),
                "lang": pa.array([r[2] for r in rows]),
                "content": pa.array([r[3] for r in rows]),
            }
        )
    )


def test_extract_links_python_java_js(ray_session):
    ds = _docs(
        [
            ("o/r", "src/core/a.py", "python", "import core.b\nfrom util.c import d\nx = 1"),
            ("o/r", "src/Main.java", "java", "import com.example.Foo;\nclass Main {}"),
            ("o/r", "src/app.js", "javascript", "const b = require('./lib')\nimport x from 'mod'"),
            ("o/r", "notes.md", "markdown", "import nothing"),
        ]
    )
    out = extract_links(ds).to_pandas()
    urls = set(out["dst_url"])
    assert "repo://o/r/src/core/b.py" in urls
    assert "repo://o/r/src/util/c.py" in urls
    assert "repo://o/r/src/com/example/Foo.java" in urls
    assert "repo://o/r/src/lib.js" in urls
    assert "repo://o/r/src/mod.js" in urls
    # markdown has no extractor
    assert not (out["src_path"] == "notes.md").any()


def test_extract_links_cap(ray_session):
    content = "\n".join(f"import m{i}" for i in range(30))
    ds = _docs([("o/r", "src/a.py", "python", content)])
    out = extract_links(ds).to_pandas()
    assert len(out) == 10  # MAX_LINKS_PER_DOC, Crawler.java:475-489 analog


def test_normalize_keys_stage(ray_session):
    from seekr_ray.stages.links import normalize_keys

    ds = _docs(
        [
            ("Org/Repo", "./src//a.py", "python", "x"),
            ("", "src/b.py", "python", "x"),
        ]
    )
    out = normalize_keys(ds).to_pandas()
    assert len(out) == 1
    assert out["repo"][0] == "org/repo"
    assert out["path"][0] == "src/a.py"


def test_total_hits(ray_session):
    import os

    from seekr_ray.query.engine import QueryEngine

    index_dir = "/tmp/seekr_test_index"
    if not os.path.exists(os.path.join(index_dir, "meta.json")):
        import ray.data as rd

        from seekr_ray.build import build_index
        from seekr_ray.config import IndexConfig
        from seekr_ray.fixtures import cached_corpus_path

        build_index(
            rd.read_parquet(cached_corpus_path(120)),
            index_dir,
            IndexConfig(num_term_partitions=4, num_id_partitions=4),
            key_cols=["repo", "path", "commit"],
        )
    engine = QueryEngine(index_dir)
    n = engine.total_hits("parse buffer")
    # equals the faithful candidate count for the same free-text query
    result = engine.query("parse buffer")
    assert n == len(result.documents)
    assert engine.total_hits("zzzzqqqq") == 0
