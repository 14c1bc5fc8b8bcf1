"""PII / secret scrubbing for training-data curation — the redaction
pass a code-corpus pipeline runs before anything else sees the text
(emails in commit blobs, hardcoded IPs, long hex credentials).

Ray-Data-first: one ``map_batches`` pass with module-compiled regexes
(compiled once per worker process at import, the stateless analog of an
actor-pool ``__init__``); no shuffle, no driver state — each doc row
maps to one result row.

SQL-oracle-able by construction: the patterns use only RE2-compatible
ASCII classes (``[0-9]`` not ``\\d``, ``re.ASCII`` word boundaries) and
the three replacements apply in a FIXED order (emails, then IPs on the
intermediate, then hex secrets) so DuckDB's nested ``regexp_replace``
CTE reproduces the byte-identical scrubbed text; equality is checked by
md5 (DuckDB ``md5`` == hashlib hexdigest over UTF-8 bytes).
"""

from __future__ import annotations

import hashlib
import re

import pyarrow as pa

# RE2-compatible (DuckDB regexp_*) ASCII patterns; \b under re.ASCII
# matches RE2's ASCII-only word boundary
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_PATTERN = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
HEX_SECRET_PATTERN = r"\b[0-9a-fA-F]{32,}\b"

_EMAIL_RE = re.compile(EMAIL_PATTERN, re.ASCII)
_IPV4_RE = re.compile(IPV4_PATTERN, re.ASCII)
_HEX_RE = re.compile(HEX_SECRET_PATTERN, re.ASCII)

EMAIL_TOKEN = "<EMAIL>"
IP_TOKEN = "<IP>"
SECRET_TOKEN = "<SECRET>"


def scrub_text(text: str) -> tuple[str, int, int, int]:
    """(scrubbed, n_emails, n_ips, n_secrets) — fixed redaction order."""
    s1, n_email = _EMAIL_RE.subn(EMAIL_TOKEN, text)
    s2, n_ip = _IPV4_RE.subn(IP_TOKEN, s1)
    s3, n_hex = _HEX_RE.subn(SECRET_TOKEN, s2)
    return s3, n_email, n_ip, n_hex


def pii_scrub(docs_ds, *, text_col: str = "text"):
    """Per-doc redaction report:
    ``(doc_id, n_emails, n_ips, n_secrets, scrubbed_md5)``.

    The scrubbed text itself stays worker-side (at corpus scale it is a
    rewrite you'd ``write_parquet`` from the same pass — see
    ``pii_scrub_rewrite``); the md5 travels so the oracle can assert
    byte-identical redaction without moving the corpus."""

    def scrub(batch: pa.Table) -> pa.Table:
        n_e, n_i, n_h, digests = [], [], [], []
        for t in batch[text_col].to_pylist():
            s, a, b, c = scrub_text(t or "")
            n_e.append(a)
            n_i.append(b)
            n_h.append(c)
            digests.append(hashlib.md5(s.encode()).hexdigest())
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_emails": pa.array(n_e, pa.int64()),
                "n_ips": pa.array(n_i, pa.int64()),
                "n_secrets": pa.array(n_h, pa.int64()),
                "scrubbed_md5": pa.array(digests, pa.string()),
            }
        )

    return docs_ds.map_batches(scrub, batch_format="pyarrow")


def pii_scrub_rewrite(docs_ds, *, text_col: str = "text"):
    """The ACTION form: same pass, emits ``(doc_id, text)`` with the
    redacted text — the stage a real pipeline chains into
    ``write_parquet`` (streaming, no shuffle, resumable per input
    shard)."""

    def scrub(batch: pa.Table) -> pa.Table:
        out = [scrub_text(t or "")[0] for t in batch[text_col].to_pylist()]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                text_col: pa.array(out, pa.large_string()),
            }
        )

    return docs_ds.map_batches(scrub, batch_format="pyarrow")
