"""Batch multi-query scoring must equal per-query wand_topk/oracle."""

import pytest

from searty_spark import oracle as O
from searty_spark.build import build_postings, doc_stats
from searty_spark.segments import build_segments
from searty_spark.wand import wand_topk_batch

QUERIES = {
    "q_common": "the",
    "q_phraseish": "shared phrase",
    "q_miss": "zzqzzqzz",
    "q_short": "ab",
    "q_dup": "aaaa",
}


@pytest.fixture(scope="module")
def seg(small_corpus):
    p = build_postings(small_corpus, with_doc_len=True)
    s = doc_stats(small_corpus)
    row = s.groupBy().agg({"doc_len": "avg", "*": "count"}).collect()[0]
    seg_df = build_segments(p, s, n_shards=3, n_buckets=8, block_size=16).cache()
    return seg_df, int(row["count(1)"]), float(row["avg(doc_len)"])


def test_batch_matches_oracle_per_query(seg, oracle_index):
    seg_df, n_docs, avgdl = seg
    out = wand_topk_batch(
        seg_df, QUERIES, k=12, n_docs=n_docs, avgdl=avgdl, n_shards=3
    ).collect()
    by_q: dict[str, list] = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append((r["doc_id"], r["score"]))
    for qid, q in QUERIES.items():
        want = O.bm25_topk(oracle_index, q, k=12)
        assert by_q.get(qid, []) == want, f"{qid}: {q!r}"


def test_batch_raises_on_duplicate_shard_term_rows(seg):
    """Unmerged partial indexes (two segment rows per (shard, term))
    must fail loudly in the batch path — keying by term would silently
    drop one row's postings."""
    seg_df, n_docs, avgdl = seg
    doubled = seg_df.unionByName(seg_df)
    with pytest.raises(Exception, match="duplicate segment row"):
        wand_topk_batch(
            doubled, {"q": "shared phrase"}, k=5, n_docs=n_docs, avgdl=avgdl, n_shards=3
        ).collect()


def test_phrase_seg_raises_on_duplicate_shard_term_rows(seg):
    from searty_spark.phrase_seg import phrase_ranges_segments

    seg_df, _, _ = seg
    doubled = seg_df.unionByName(seg_df)
    with pytest.raises(Exception, match="duplicate segment row"):
        phrase_ranges_segments(doubled, "shared phrase", n_shards=3).collect()
