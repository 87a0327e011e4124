"""Driver-transfer ratchet: no NEW `.collect()`/`.toPandas()`/`.first()`
/`.head(` may appear in non-test source unaudited.

Companion to tests/test_broadcast_ratchet.py. The scale doctrine is that
driver state must be BOUNDED MODEL STATE — k centroids, a d×d moment
matrix, a merge-table page, a k-row shortlist — never anything that
grows with corpus row count (a driver-side loop over collected corpus
rows is the definition of a non-distributed operator). The r7 verdict
spot-verified all sites by hand (64×64 Procrustes moments, literal-
bounded binary staging, BPE top-page, 20-row MMR shortlist); this pin
makes the next new site fail the default suite until it is consciously
audited as bounded, with the audit note next to its signature below.

Pin mechanics (r8 ADVICE upgrade): AST-extracted sites pinned per
(file, enclosing-scope qualname), so docstring mentions can't skew the
pin and a same-file swap between functions is caught. `F.first(col)`
(the JVM aggregate) is excluded by construction — see
tests/ratchet_util.py:is_driver_transfer.

Regenerate after an audit: `python tests/ratchet_util.py transfer`.
"""

from __future__ import annotations

from tests.ratchet_util import (
    diff_signatures,
    is_driver_transfer,
    tree_signatures,
)

# {file: {enclosing qualname: audited driver-transfer count}} with the
# boundedness audit per function:
#   kmeans_fit / pq_train_codebooks    — k seed/centroid rows per iter
#   sample_kmeans_centroids            — sampled LSH hyperplanes (h×d)
#   lineitem_price_index               — 1-row min(ym) anchor
#   sim_mmr_rerank                     — 20-row MMR shortlist
#   embed_pca_project / procrustes     — d×d gram/moments, 1-row mse
#   source_binary_files / jdbc         — 1-row max key + literal staging
#   _bpe_train / text_bpe_encode       — BPE top-page, vocab-bounded
AUDITED = {
    "operators/clustering.py": {"kmeans_fit": 2, "pq_train_codebooks": 1},
    "operators/similarity.py": {"sample_kmeans_centroids": 1},
    "queries/aggregates.py": {"lineitem_price_index": 1},
    "queries/llm_sim.py": {"sim_mmr_rerank": 1},
    "queries/pipeline.py": {"embed_pca_project": 2, "embed_procrustes_align": 2},
    "queries/scans.py": {"source_binary_files": 1, "source_jdbc_partitioned": 1},
    "queries/training.py": {"_bpe_train": 1, "text_bpe_encode": 1},
}


def test_no_unaudited_driver_transfers():
    got = tree_signatures(is_driver_transfer)
    new, gone = diff_signatures(AUDITED, got)
    assert not new, (
        f"NEW driver-transfer sites beyond the audited pin: {new}. "
        "Verify each new collect/toPandas/first/head holds BOUNDED "
        "model state (size independent of corpus rows), then re-bless "
        "its signature in tests/test_collect_ratchet.py with an audit "
        "note (regenerate: python tests/ratchet_util.py transfer)."
    )
    assert not gone, (
        f"Audited driver-transfer signatures are stale: {gone}. Update "
        "the pins in tests/test_collect_ratchet.py."
    )


def test_driver_transfer_selector_semantics():
    """Pin the selector itself (r9 ADVICE): `.take(n)` and
    `.toLocalIterator()` ARE driver transfers; `pdf.head(n)` on a
    pandas-named receiver inside an Arrow UDF body is NOT (it runs
    executor-side); `F.first(col)` stays excluded."""
    import ast

    def sites(src):
        n = 0
        for node in ast.walk(ast.parse(src)):
            if isinstance(node, ast.Call) and is_driver_transfer(node):
                n += 1
        return n

    assert sites("df.take(5)") == 1
    assert sites("df.toLocalIterator()") == 1
    assert sites("df.toLocalIterator(True)") == 1
    assert sites("df.head(5)") == 1
    assert sites("pdf.head(5)") == 0
    assert sites("chunk_pdf.head(5)") == 0
    assert sites("pandas_frame.head(5)") == 0
    assert sites("F.first(col)") == 0
    assert sites("df.first()") == 1
    assert sites("df.first(1)") == 0  # pandas-style .first(offset)
