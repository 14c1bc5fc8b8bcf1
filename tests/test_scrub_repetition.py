"""PII scrubbing + repetition signals: kernel laws pinned against
crafted documents, and the Python regex semantics asserted equal to
DuckDB's RE2 on the same patterns (the oracle's precondition)."""

import duckdb
import pandas as pd
import pytest

from seekr_ray.extras.repetition import doc_repetition_signals
from seekr_ray.extras.scrub import (
    EMAIL_PATTERN,
    HEX_SECRET_PATTERN,
    IPV4_PATTERN,
    scrub_text,
)

CRAFTED = [
    "contact alice.smith+dev@example.co.uk or bob@sub.domain.org now",
    "server at 10.0.0.1 and 192.168.254.3, token "
    "deadbeefdeadbeefdeadbeefdeadbeef done",
    "email-with-ip user@1.2.3.4.example.com then bare 8.8.8.8",
    "no pii here at all",
    "",
    "short hex cafebabe is fine; long "
    "0123456789abcdef0123456789abcdef0123456789abcdef is not",
    "upper AWS-style DEADBEEFDEADBEEFDEADBEEFDEADBEEF and mixed "
    "DeadBeefDeadBeefDeadBeefDeadBeef creds",
]


def test_scrub_counts_and_order():
    s, e, i, h = scrub_text(CRAFTED[0])
    assert (e, i, h) == (2, 0, 0)
    assert "<EMAIL>" in s and "@" not in s
    s, e, i, h = scrub_text(CRAFTED[1])
    assert (e, i, h) == (0, 2, 1)
    assert "<IP>" in s and "<SECRET>" in s
    # the email regex eats the host-with-ip form FIRST (fixed order)
    s, e, i, h = scrub_text(CRAFTED[2])
    assert e == 1 and i == 1
    s, e, i, h = scrub_text(CRAFTED[5])
    assert h == 1 and "cafebabe" in s
    # case-insensitive hex: uppercase and mixed-case secrets redact too
    s, e, i, h = scrub_text(CRAFTED[6])
    assert h == 2 and s.count("<SECRET>") == 2


def test_scrub_matches_duckdb_re2():
    con = duckdb.connect()
    con.register("d", pd.DataFrame({"t": CRAFTED}))
    rows = con.execute(
        f"""SELECT regexp_replace(regexp_replace(regexp_replace(t,
              '{EMAIL_PATTERN}', '<EMAIL>', 'g'),
              '{IPV4_PATTERN}', '<IP>', 'g'),
              '{HEX_SECRET_PATTERN}', '<SECRET>', 'g'),
            len(regexp_extract_all(t, '{EMAIL_PATTERN}'))
        FROM d"""
    ).fetchall()
    for text, (sql_scrubbed, sql_emails) in zip(CRAFTED, rows):
        py_scrubbed, n_e, _, _ = scrub_text(text)
        assert py_scrubbed == sql_scrubbed, text
        assert n_e == sql_emails, text


def test_repetition_signals_laws():
    # 4 lines, one duplicated -> dup fraction 1/4
    t = "alpha beta\nbeta gamma\nalpha beta\ngamma delta"
    n_lines, n_dist, n_big, top, n_dbig = doc_repetition_signals(t)
    assert (n_lines, n_dist) == (4, 3)
    # tokens: alpha beta beta gamma alpha beta gamma delta ->
    # bigram 'alpha beta' occurs twice
    assert n_big == 7 and top == 2
    # empty doc: one empty line, no bigrams
    assert doc_repetition_signals("") == (1, 1, 0, 0, 0)
    # single token -> no bigrams
    assert doc_repetition_signals("hello")[2:] == (0, 0, 0)


def test_attach_value_drop_mode(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from seekr_ray.extras.copart import attach_value

    target = rd.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 2, 3, 4], pa.int64()),
                "payload": pa.array([10, 20, 30, 40], pa.int64()),
            }
        )
    )
    lookup = rd.from_arrow(
        pa.table(
            {
                "node": pa.array([2, 4], pa.int64()),
                "value": pa.array([200, 400], pa.int64()),
            }
        )
    )
    out = (
        attach_value(
            target, lookup, key_col="k", out_col="v", carry=["payload"],
            missing="drop",
        )
        .to_pandas()
        .sort_values("k")
    )
    assert list(out["k"]) == [2, 4]
    assert list(out["payload"]) == [20, 40]
    assert list(out["v"]) == [200, 400]
    # error mode still raises on the same input
    with pytest.raises(Exception):
        attach_value(
            target, lookup, key_col="k", out_col="v", carry=["payload"]
        ).to_pandas()


def test_pii_scrub_rewrite_action(ray_session):
    import ray.data as rd

    from seekr_ray.extras.scrub import pii_scrub_rewrite

    ds = rd.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(CRAFTED)]
    )
    out = pii_scrub_rewrite(ds).to_pandas().sort_values("doc_id")
    assert list(out["doc_id"]) == list(range(len(CRAFTED)))
    joined = "\n".join(out["text"])
    assert "@" not in joined.replace("<EMAIL>", "")
    assert "10.0.0.1" not in joined
    assert "deadbeefdeadbeef" not in joined
