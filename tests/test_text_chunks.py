"""Semantic properties of the chunking / sub-document-dedup / markup ops
(their value oracles live in test_oracle.py; these pin the *invariants*
the oracle alone can't state: overlap geometry, global line uniqueness,
reconstruction fidelity)."""

import re

import pandas as pd

from kafka_cdc_hudi_spark.plans.catalog_text import (
    CHUNK_SIZE,
    CHUNK_STRIDE,
    LINE_TOKENS,
    dedup_lines_reconstruct,
    text_chunk_overlap,
    text_html_strip,
)

from .conftest import SF_DIR

_TOK_RE = re.compile(r"[^a-z0-9]+")


def _toks(s: str) -> list[str]:
    return [t for t in _TOK_RE.split(s.lower()) if t]


def _docs_pdf() -> pd.DataFrame:
    return pd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])


def test_chunk_overlap_geometry_and_coverage(spark):
    out = text_chunk_overlap(spark, SF_DIR).toPandas()
    docs = _docs_pdf().set_index("doc_id")["text"]
    overlap = CHUNK_SIZE - CHUNK_STRIDE
    for doc_id, grp in out.groupby("doc_id"):
        grp = grp.sort_values("chunk_id")
        chunks = [_toks(t) for t in grp["chunk_text"]]
        assert list(grp["n_tokens"]) == [len(c) for c in chunks]
        # all but the last chunk are exactly CHUNK_SIZE tokens
        assert all(len(c) == CHUNK_SIZE for c in chunks[:-1])
        # consecutive chunks share exactly the overlap region
        for a, b in zip(chunks, chunks[1:]):
            assert a[CHUNK_STRIDE:] == b[: len(a) - CHUNK_STRIDE]
        # de-overlapped concatenation reconstructs the token stream
        rebuilt = list(chunks[0])
        for c in chunks[1:]:
            rebuilt.extend(c[overlap:])
        assert rebuilt == _toks(docs.loc[doc_id])


def test_dedup_lines_unique_and_reconstructable(spark):
    out = dedup_lines_reconstruct(spark, SF_DIR).toPandas()
    n_docs = len(_docs_pdf())
    # some documents must actually lose lines (fixture calibration — a
    # vacuous pass would prove nothing, cf. _MUST_BE_NONEMPTY)
    assert out["kept_lines"].sum() < out["total_lines"].sum()
    assert len(out) <= n_docs
    all_lines = []
    for _, row in out.iterrows():
        toks = _toks(row["text_dedup"])
        lines = [
            " ".join(toks[i : i + LINE_TOKENS])
            for i in range(0, len(toks), LINE_TOKENS)
        ]
        # re-segmenting the reconstruction yields exactly kept_lines lines
        # (full lines sort before the doc's one possibly-short final line)
        assert len(lines) == row["kept_lines"]
        assert row["kept_lines"] <= row["total_lines"]
        all_lines.extend(lines)
    # first-occurrence-wins: surviving lines are globally unique
    assert len(all_lines) == len(set(all_lines))


def test_html_strip_matches_python_re(spark):
    out = text_html_strip(spark, SF_DIR).toPandas().set_index("doc_id")
    docs = _docs_pdf().head(25)
    for _, row in docs.iterrows():
        i, text = int(row["doc_id"]), row["text"]
        aug = (
            f"<html><head><title>Doc {i}</title></head><body><p>{text}</p>"
            f'<a href="https://example.com/d/{i}">ref</a>'
            + ('<a href="https://example.com/even">even</a>' if i % 2 == 0 else "")
            + '<br/><div class="footer">end</div></body></html>'
        )
        got = out.loc[i]
        assert got["clean_text"] == re.sub(
            r"\s+", " ", re.sub(r"<[^>]+>", " ", aug)
        ).strip()
        assert got["title"] == f"Doc {i}"
        assert got["n_tags"] == len(re.findall(r"<[^>]+>", aug))
        assert got["n_links"] == (2 if i % 2 == 0 else 1)


def test_rag_index_masks_self_hits_and_fills_k(spark):
    """Every query retrieves exactly _RAG_K chunks, ranked 1..K, and never
    one of its own chunks (the self-hit mask a RAG eval depends on)."""
    from kafka_cdc_hudi_spark.plans.catalog_text import _RAG_K, _RAG_NQ, pipeline_rag_index

    from .conftest import SF_DIR

    rows = pipeline_rag_index(spark, SF_DIR).collect()
    by_q = {}
    for r in rows:
        assert r.doc_id != r.qid
        by_q.setdefault(r.qid, []).append(r.rank)
    assert len(by_q) == _RAG_NQ
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, _RAG_K + 1))
